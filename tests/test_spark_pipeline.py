"""Spark pipeline golden tests (SURVEY.md §5.2.2): the distributed
pipeline at local[2], tiny Arrow batches and salted buckets must be
byte-equal per turn to the committed sequential-oracle fixtures."""

import os

from pyspark.sql import functions as F

from ocr_engine_spark.kernel.oracle import read_golden_jsonl
from ocr_engine_spark.kernel.textutil import to_min_json
from ocr_engine_spark.plans.extract_plan import ExtractConfig, build_extracted, run_extract
from ocr_engine_spark.sources.tableio import read_transcripts

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_tiny.jsonl")


def collect_results(df):
    rows = df.orderBy("conv_id", "turn_idx").collect()
    out = []
    for r in rows:
        spans = [
            {
                "span_idx": s["span_idx"],
                "kind": s["kind"],
                "text": s["text"],
                "start": s["start"],
                "end": s["end"],
            }
            for s in (r["spans"] or [])
        ]
        out.append(
            {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "kind": r["kind"],
                "extracted_text": r["extracted_text"],
                "spans_json": to_min_json(spans),
                "blocks_kept": r["blocks_kept"],
                "blocks_dropped": r["blocks_dropped"],
                "parse_failed": r["parse_failed"],
            }
        )
    return out


def assert_matches_golden(results):
    golden = read_golden_jsonl(FIXTURE)
    assert len(results) == len(golden)
    for g, a in zip(golden, results):
        for key in (
            "conv_id", "turn_idx", "kind", "extracted_text", "spans_json",
            "blocks_kept", "blocks_dropped", "parse_failed",
        ):
            assert a[key] == g[key], (g["conv_id"], g["turn_idx"], key)


def test_pipeline_byte_equal_to_golden(spark, tiny_transcripts):
    df = read_transcripts(spark, tiny_transcripts)
    extracted = build_extracted(df, num_buckets=8, salt_buckets=4)
    assert_matches_golden(collect_results(extracted))


def test_salting_invariance(spark, tiny_transcripts):
    """Output is identical for ANY bucket/salt configuration
    (SURVEY.md §5.2.4b)."""
    df = read_transcripts(spark, tiny_transcripts)
    a = collect_results(build_extracted(df, num_buckets=3, salt_buckets=1))
    b = collect_results(build_extracted(df, num_buckets=16, salt_buckets=7))
    assert a == b


def test_full_job_write_audit_and_resume(spark, tiny_transcripts, tmp_path):
    out = str(tmp_path / "out")
    audit = str(tmp_path / "audit")
    cfg = ExtractConfig(
        input_path=tiny_transcripts, output_path=out, audit_path=audit,
        num_buckets=8, salt_buckets=4,
    )
    stats1 = run_extract(spark, cfg)
    assert stats1["resumed_buckets_skipped"] == 0
    assert stats1["buckets_processed"] == 8

    written = spark.read.parquet(out)
    assert_matches_golden(collect_results(written))

    # audit invariants: every turn accounted for, checksum present
    audit_df = spark.read.parquet(audit)
    arows = audit_df.collect()
    assert len(arows) == 8
    assert sum(r["turns_in"] for r in arows) == written.count()
    assert all(r["turns_in"] == r["turns_out"] for r in arows)
    assert sum(r["parse_failures"] for r in arows) > 0  # generator includes failures

    # resume: second run must skip everything and change nothing
    stats2 = run_extract(spark, cfg)
    assert stats2["resumed_buckets_skipped"] == 8
    assert stats2["buckets_processed"] == 0
    assert_matches_golden(collect_results(spark.read.parquet(out)))


def test_partial_resume_idempotence(spark, tiny_transcripts, tmp_path):
    """Kill-after-k-buckets resume (SURVEY.md §5.2.4c): simulate a
    partial run by seeding the audit with only some buckets' rows, then
    resume — final table equals a single-run table."""
    out = str(tmp_path / "out")
    audit = str(tmp_path / "audit")
    cfg = ExtractConfig(
        input_path=tiny_transcripts, output_path=out, audit_path=audit,
        num_buckets=8, salt_buckets=4,
    )
    # full run, then delete audit rows for buckets >= 4 AND corrupt
    # their data — the resume must redo exactly those buckets
    run_extract(spark, cfg)
    audit_df = spark.read.parquet(audit).filter(F.col("bucket") < 4)
    kept_audit = audit_df.collect()
    import shutil

    shutil.rmtree(audit)
    from ocr_engine_spark.sources.tableio import AUDIT_SCHEMA

    spark.createDataFrame(kept_audit, schema=AUDIT_SCHEMA).write.parquet(audit)
    for b in range(4, 8):
        p = os.path.join(out, f"bucket={b}")
        if os.path.exists(p):
            shutil.rmtree(p)

    stats = run_extract(spark, cfg)
    assert stats["resumed_buckets_skipped"] == 4
    assert stats["buckets_processed"] == 4
    assert_matches_golden(collect_results(spark.read.parquet(out)))
