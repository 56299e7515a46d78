"""Properties of the round-4 batch: k-means iteration (driver loop
feeding updated centroids back), vocab pair multiplicity, PII pattern
precedence, and streaming dedup's cross-micro-batch state."""

import os

from pyspark.sql import functions as F

from ocr_engine_spark.operators import curation, similarity, textstats


def _emb(spark, n=60, dim=8):
    rows = []
    for i in range(n):
        # three planted lobes + noise-ish deterministic jitter
        lobe = i % 3
        v = [0.0] * dim
        v[lobe] = 1.0
        v[(lobe + 3) % dim] = 0.2 + (i % 7) * 0.01
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_kmeans_update_means_and_membership(spark):
    emb = _emb(spark)
    cents = similarity.centroid_vectors(emb, (0, 1, 2))
    out = similarity.kmeans_update(emb, cents).collect()
    # one row per (centroid, dim); cluster sizes sum to corpus
    sizes = {}
    for r in out:
        sizes.setdefault(r["centroid"], set()).add(r["n_members"])
    assert all(len(s) == 1 for s in sizes.values())
    assert sum(next(iter(s)) for s in sizes.values()) == 60
    # per-dim mean check against a driver-side recompute
    import collections

    assign = {
        r["vec_id"]: r["centroid"]
        for r in similarity.ivf_assignments(emb, cents).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    members = collections.defaultdict(list)
    for i, c in assign.items():
        members[c].append(vecs[i])
    for r in out:
        want = sum(v[r["dim_idx"]] for v in members[r["centroid"]]) / len(
            members[r["centroid"]]
        )
        assert abs(r["centroid_val"] - round(want, 6)) <= 1e-6


def test_kmeans_driver_loop_converges(spark):
    """The iterative shape: collect k·d updated coords, feed back as
    literals; within-cluster dispersion must not increase."""
    emb = _emb(spark)
    cents = similarity.centroid_vectors(emb, (0, 1, 2))

    def step(c):
        rows = similarity.kmeans_update(emb, c).collect()
        byc = {}
        for r in rows:
            byc.setdefault(r["centroid"], {})[r["dim_idx"]] = r["centroid_val"]
        return [
            [byc[c + 1][d] for d in range(len(cents[0]))]
            for c in range(len(cents))
        ]

    def cost(c):
        assigned = emb.select(
            similarity.ivf_assign_col(c).alias("ctr"), "embedding"
        ).collect()
        tot = 0.0
        for r in assigned:
            cen = c[r["ctr"] - 1]
            tot += sum((float(a) - b) ** 2 for a, b in zip(r["embedding"], cen))
        return tot

    c1 = step(cents)
    c2 = step(c1)
    assert cost(c1) <= cost(cents) + 1e-9
    assert cost(c2) <= cost(c1) + 1e-9


def test_vocab_pairs_keep_multiplicity(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b a"), (1, "a b c")], "doc_id LONG, text STRING"
    )
    out = {r["pair"]: r["n"] for r in textstats.vocab_pair_counts(docs, 10).collect()}
    # "a b" appears twice in doc 0 and once in doc 1 — multiplicity kept
    assert out["a b"] == 3
    assert out["b a"] == 2
    assert out["b c"] == 1


def test_redact_pii_precedence_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me: a.b+c@x-mail.org now"),
            (1, "call +1 (415) 555-0199 soon"),
            (2, "ref 123456789012 ok"),      # long run -> phone-shaped
            (3, "ref 123456 ok"),            # exactly 6 -> digits
            (4, None),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in curation.redact_pii(docs).collect()}
    assert out[0]["redacted"] == "mail me: <email> now"
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_digits"]) == (1, 0, 0)
    assert out[1]["redacted"] == "call <phone> soon"
    assert out[1]["n_phone"] == 1
    # 12-digit run is claimed by the earlier-ordered phone pattern
    assert out[2]["redacted"] == "ref <phone> ok"
    assert out[3]["redacted"] == "ref <digits> ok"
    assert out[3]["n_digits"] == 1
    assert out[4]["redacted"] == ""


def test_streaming_dedup_drops_across_micro_batches(spark, tmp_path):
    from ocr_engine_spark.streaming.extract_stream import (
        build_dedup_stream,
        read_transcripts_stream,
    )

    in_dir = str(tmp_path / "in")
    rows = [
        (str(i), 0, "user", f"text number {i % 5}", None, "2024-01-01 00:00:00")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id STRING, turn_idx INT, role STRING, text STRING, "
        "tool STRING, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # file A: first 10 rows; file B: last 10 (all duplicate texts of A)
    df.filter(F.col("conv_id").cast("int") < 10).coalesce(1).write.parquet(
        in_dir
    )
    df.filter(F.col("conv_id").cast("int") >= 10).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = read_transcripts_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        build_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_sdedup").collect()
    assert len(got) == 5  # 5 distinct texts; batch-2 duplicates dropped
    assert sorted(r["text_norm"] for r in got) == [
        f"text number {i}" for i in range(5)
    ]
    # progress shows >1 micro-batch (maxFilesPerTrigger=1, 2 files)
    assert len(q.recentProgress) >= 2


def test_kmeans_centroids_collect_and_empty_cluster_fallback(spark):
    emb = _emb(spark)
    cents = similarity.centroid_vectors(emb, (0, 1, 2))
    got = similarity.kmeans_centroids(emb, cents)
    assert len(got) == 3 and all(len(c) == 8 for c in got)
    # assignment is max-DOT: a strongly negative centroid scores below
    # every real one on this all-positive corpus, captures nothing,
    # and must keep its coordinates (empty-cluster fallback)
    far = [[-9.0] * 8] + cents
    got2 = similarity.kmeans_centroids(emb, far)
    assert got2[0] == [-9.0] * 8
