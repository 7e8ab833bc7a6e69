"""wasserstein_1d and zscore_normalize semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.wasserstein import wasserstein_1d
from data_profiler_for_aws_glue_data_catalog_spark.operators.zscore import zscore_normalize


def test_w1_identical_zero_and_shift_exact(spark):
    a = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    assert wasserstein_1d(a, a, "x").collect()[0]["w1"] == 0.0
    # constant shift by 3: W1 == 3 exactly for equal-size samples
    b = a.select((F.col("x") + 3.0).alias("x"))
    r = wasserstein_1d(a, b, "x").collect()[0]
    assert abs(r["w1"] - 3.0) < 1e-9
    assert r["n_left"] == r["n_right"] == 100


def test_w1_vs_ks_sensitivity(spark):
    """A small uniform shift moves W1 proportionally while KS stays at
    the single-step height — the reason both metrics exist."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.divergence import ks_statistic

    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    b = a.select((F.col("x") + 0.5).alias("x"))
    w1 = wasserstein_1d(a, b, "x").collect()[0]["w1"]
    ks = ks_statistic(a, b, "x").collect()[0]["ks"]
    assert abs(w1 - 0.5) < 1e-6
    assert ks <= 0.011  # 1/100 + rounding


def test_zscore_group_standardization(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows += [("b", 10 + i, 7.0) for i in range(3)]  # constant group
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = zscore_normalize(df, "v", "g", "id")
    a = [r for r in out.collect() if r["group_key"] == "a"]
    zs = sorted(r["z"] for r in a)
    assert abs(sum(zs)) < 1e-6  # mean 0
    assert abs(max(zs) + min(zs)) < 1e-6  # symmetric
    b = [r for r in out.collect() if r["group_key"] == "b"]
    assert all(r["z"] is None for r in b)  # zero-variance -> NULL


def test_ab_compare_arms(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.zscore import ab_compare

    df = spark.range(10000).select(
        F.col("id").alias("user_id"), (F.col("id") % 100).cast("double").alias("v")
    )
    rows = {r["arm"]: r for r in ab_compare(df, "v", "user_id").collect()}
    assert set(rows) == {"treatment", "control"}
    total = rows["treatment"]["n"] + rows["control"]["n"]
    assert total == 10000
    assert 0.4 < rows["treatment"]["n"] / total < 0.6  # ~50/50 split
    for r in rows.values():
        assert r["ci_low"] <= r["mean"] <= r["ci_high"]
    # deterministic assignment: identical on re-run
    again = {r["arm"]: r["n"] for r in ab_compare(df, "v", "user_id").collect()}
    assert again == {k: v["n"] for k, v in rows.items()}
