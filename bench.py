#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Prints ONE JSON line:

    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {<name>: sec, ...}, "sf": 0.1,
     "extract": {"rows": N, "local8": {...}, "local32": {...},
                 "scaling_efficiency": e,
                 "hardware_ceiling_efficiency": e_hw}}

Two parts:

1. **Scaling evidence** (BASELINE.md protocol — the sandbox stand-in
   for N vs 4N executors): the identical extraction job (bucket shuffle
   → streaming mapInArrow kernels → sortWithinPartitions → noop sink)
   over the same cached synthetic transcript corpus (~3.4M turns,
   Zipf-skewed with forced mega-conversations) at ``local[8]`` then
   ``local[$SPARK_GRAFT_CPUS]``; reports turns/sec at both and
   ``eff = (thr_hi / thr_lo) / (cpus_hi / cpus_lo)``. Protocol details
   (all measured necessities on this VM, see BASELINE.md):
   - one untimed warm run per level (spawns Python workers, JIT);
   - best-of-BENCH_RUNS timed runs with forced full GCs between runs
     (ContextCleaner reclaims prior runs' shuffle state only on full
     GC; without it identical reruns degrade 2.5s → 43s);
   - shuffle dir on tmpfs + shuffle compression off: local mode has no
     network, so compression is pure CPU overhead here (a real
     multi-executor cluster keeps the default lz4);
   - fixed num_buckets across levels — the bucket is the deterministic
     work unit, so both levels execute the byte-identical plan.
   Also reports the *hardware ceiling*: the same kernels run via
   multiprocessing (no Spark) at 8 vs 32 processes — this VM's memory
   bandwidth bounds any 8→32 scaling at roughly that number.

2. **Headline catalog queries** at ``$SPARK_GRAFT_SF_DIR`` (default
   /root/testdata/sf0.1): each timed to full materialization via the
   noop sink after an untimed warmup query.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_CONVS (default 700000 ≈ 3.4M turns), BENCH_SCALING=0 to skip
part 1 (quick iteration), BENCH_HEADLINE=0 to skip part 2,
BENCH_LO_RUNS / BENCH_HI_RUNS (defaults 2 / 4).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BENCH_CONVS", "700000"))
LO_RUNS = int(os.environ.get("BENCH_LO_RUNS", "2"))
HI_RUNS = int(os.environ.get("BENCH_HI_RUNS", "4"))
SEED = 42
MEGA, MEGA_TURNS = 3, 50000  # forced skew: salting must earn its keep
NUM_BUCKETS, SALT_BUCKETS = 256, 8
CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench", f"transcripts-v1-{N_CONVS}",
)

HEADLINE = [
    "flagship_extract",
    "p1_payload_kind",
    "x1_slugify_part",
    "a5_keep_longer_orders",
    "a2_ordered_concat_lineitem",
    "o2_row_number_events",
    "f6_json_probe_events",
    "tokens_documents",
    "quality_documents",
    "fingerprint_documents",
    "langid_documents",
    "dedup_exact_documents",
    "minhash_signatures_documents",
    "simhash_documents",
    "ngram_jaccard_pairs_documents",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "dedup_embedding_near_pairs",
    "a6_prompt_assembly_documents",
    "a3_gap_fill_lineitem",
    "multimodal_image_features",
    "minhash_lsh_candidates",
    "winnow_fingerprints_documents",
    "ann_ivf_assignments",
]


def _local_bench_extras() -> dict:
    extras = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extras["spark.local.dir"] = d
    # Local mode: shuffle never crosses a network, compression is pure
    # CPU overhead (measured ~200 core-s on the 3.4M-turn corpus). A
    # real cluster keeps the lz4 default.
    extras["spark.shuffle.compress"] = "false"
    extras["spark.shuffle.spill.compress"] = "false"
    return extras


def _noop(df) -> None:
    """Force full computation without result-materialization cost."""
    df.write.format("noop").mode("overwrite").save()


def _session(master: str, shuffle_partitions: int):
    from ocr_engine_spark.session import build_session

    return build_session(
        app_name=f"bench-{master}", master=master,
        shuffle_partitions=shuffle_partitions, extra=_local_bench_extras(),
    )


def _ensure_corpus() -> int:
    """Generate (distributed) + cache the synthetic corpus; returns row
    count. Generation is executor-side (tableio.generate_transcripts_
    distributed) so even cold-cache cost is ~2 min, not ~10."""
    from ocr_engine_spark.sources import tableio

    marker = os.path.join(CACHE, "_ROWS")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip())
    if os.path.exists(CACHE):
        shutil.rmtree(CACHE)
    spark = _session(f"local[{CPUS}]", shuffle_partitions=CPUS * 2)
    try:
        df = tableio.generate_transcripts_distributed(
            spark, N_CONVS, seed=SEED, mega=MEGA, mega_turns=MEGA_TURNS,
            partitions=CPUS * 4,
        )
        df.write.mode("overwrite").parquet(CACHE)
        n = spark.read.parquet(CACHE).count()
    finally:
        spark.stop()
    with open(marker, "w") as f:
        f.write(str(n))
    return n


def _time_extract(master: str, cores: int, rows: int, runs: int) -> dict:
    """Steady-state timing of the full extraction job at one
    parallelism level: cheap 5% warm pass (spawns workers + JIT), then
    best-of-``runs`` with forced full GCs between runs (see module
    docstring). The high-parallelism level gets more runs — its
    wall-clock is short so noise bursts dominate single samples."""
    from ocr_engine_spark.plans.extract_plan import build_extracted
    from ocr_engine_spark.sources import tableio

    spark = _session(master, shuffle_partitions=max(64, cores * 2))
    try:
        df = tableio.read_transcripts(spark, CACHE)
        out = build_extracted(df, num_buckets=NUM_BUCKETS, salt_buckets=SALT_BUCKETS)
        warm = build_extracted(df.sample(0.05, seed=7), num_buckets=NUM_BUCKETS,
                               salt_buckets=SALT_BUCKETS)
        _noop(warm)  # warmup: python workers, imports, JIT
        times = []
        for _ in range(runs):
            # double full-GC: one pass queues ContextCleaner weak-ref
            # cleanups, the second actually reclaims the shuffle state
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.5)
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.5)
            t0 = time.time()
            _noop(out)
            times.append(time.time() - t0)
        dt = min(times)
    finally:
        spark.stop()
    return {
        "sec": round(dt, 3),
        "all_runs_sec": [round(t, 1) for t in times],
        "turns_per_sec": round(rows / dt, 1),
        "cores": cores,
    }


def _hw_work(seed_ix: int) -> float:
    """Per-process unit of the hardware-ceiling measurement (module
    level: multiprocessing must pickle it)."""
    from ocr_engine_spark.kernel.dispatch import extract_turn
    from ocr_engine_spark.sources.synth import gen_conversation

    rows = []
    for c in range(40):
        rows.extend(gen_conversation(SEED, f"hw-{seed_ix}-{c}", 40))
    t0 = time.time()
    for r in rows:
        extract_turn(r["role"], r["text"])
    return len(rows) / (time.time() - t0)


def _hardware_ceiling() -> dict:
    """8-vs-32-process scaling of the bare kernels via multiprocessing
    — no Spark, no JVM: this VM's upper bound for any 8→32 speedup."""
    import multiprocessing as mp

    out = {}
    for procs in (8, 32):
        with mp.Pool(procs) as pool:
            rates = pool.map(_hw_work, range(procs))
        out[procs] = round(sum(rates))
    return {
        "rows_per_sec_8p": out[8],
        "rows_per_sec_32p": out[32],
        "efficiency": round((out[32] / out[8]) / 4, 3),
    }


def main() -> int:
    from ocr_engine_spark.catalog import queries

    result: dict = {"sf": 0.1, "unit": "sec"}

    # ---- part 1: scaling evidence ------------------------------------
    if os.environ.get("BENCH_SCALING", "1") != "0":
        rows = _ensure_corpus()
        lo_cores, hi_cores = 8, CPUS
        lo = _time_extract(f"local[{lo_cores}]", lo_cores, rows, LO_RUNS)
        hi = _time_extract(f"local[{hi_cores}]", hi_cores, rows, HI_RUNS)
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (hi_cores / lo_cores)
        hw = _hardware_ceiling()
        result["extract"] = {
            "rows": rows,
            f"local{lo_cores}": lo,
            f"local{hi_cores}": hi,
            "scaling_efficiency": round(eff, 3),
            "hardware_ceiling": hw,
            "normalized_efficiency": round(eff / hw["efficiency"], 3)
            if hw["efficiency"]
            else None,
        }

    # ---- part 2: headline catalog queries at SF_DIR ------------------
    if os.environ.get("BENCH_HEADLINE", "1") == "0":
        result["queries"] = {}
        result["metric"] = "headline_queries_total"
        result["value"] = 0.0
        print(json.dumps(result))
        return 0
    qtimes: dict = {}
    spark = _session(f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        qs = queries()
        # Warmup: spawn python workers + JIT/codegen once, untimed —
        # steady-state per-query cost is what the numbers should show.
        _noop(qs["flagship_extract"](spark, SF_DIR))
        for name in HEADLINE:
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            qtimes[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()

    result["queries"] = qtimes
    result["metric"] = "headline_queries_total"
    result["value"] = round(sum(qtimes.values()), 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
