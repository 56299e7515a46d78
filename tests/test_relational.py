"""Relational-surface properties: the mergeable approx_percentile
sketch honors its rank-error contract vs exact percentiles (the scale
path the exact oracle query stands in for), and the declared-values
pivot avoids the distinct-scan."""

from pyspark.sql import functions as F


def test_approx_percentile_within_rank_error(spark):
    n = 20000
    acc = 1000  # rank error <= n/acc = 20 ranks
    df = spark.range(n).select(
        (F.col("id") * 37 % 10007).cast("double").alias("v")
    )
    vals = sorted(r["v"] for r in df.collect())
    row = df.agg(
        F.expr(f"approx_percentile(v, array(0.5, 0.95), {acc})").alias("ap")
    ).first()
    for q, got in zip((0.5, 0.95), row["ap"]):
        lo_rank = max(0, int((q - 1.0 / acc) * n) - 1)
        hi_rank = min(n - 1, int((q + 1.0 / acc) * n) + 1)
        assert vals[lo_rank] <= got <= vals[hi_rank], (q, got)


def test_pivot_declared_values_single_scan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "k LONG, t STRING"
    )
    out = df.groupBy("k").pivot("t", ["a", "b"]).agg(F.count(F.lit(1)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one aggregate pair (partial+final) over one scan — a pivot with
    # UNDECLARED values would first run a separate distinct query
    assert plan.count("Scan") == 1, plan
