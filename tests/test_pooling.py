"""mean_pool element-wise mean semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.pooling import mean_pool


def test_mean_pool_elementwise(spark):
    rows = [
        ("a", [1.0, 2.0]), ("a", [3.0, 4.0]),
        ("b", [10.0, 20.0]),
    ]
    df = spark.createDataFrame(rows, "k string, embedding array<double>")
    out = {r["key"]: r for r in mean_pool(df, "k").collect()}
    assert out["a"]["pooled"] == [2.0, 3.0]
    assert out["a"]["n_vectors"] == 2 and out["a"]["dim"] == 2
    assert out["b"]["pooled"] == [10.0, 20.0]


def test_mean_pool_masks_bad_vectors(spark):
    rows = [("a", [1.0, 1.0]), ("a", None), ("a", [9.0]), ("c", None)]
    df = spark.createDataFrame(rows, "k string, embedding array<double>")
    out = {r["key"]: r for r in mean_pool(df, "k", expected_dim=2).collect()}
    assert out["a"]["n_vectors"] == 1 and out["a"]["pooled"] == [1.0, 1.0]
    assert "c" not in out  # no valid vector
