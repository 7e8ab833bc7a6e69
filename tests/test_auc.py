"""roc_auc rank-sum identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.auc import roc_auc


def test_auc_perfect_random_inverted(spark):
    df = spark.range(1000).select(
        (F.col("id") / 1000.0).alias("s"),
        (F.col("id") >= 500).cast("int").alias("y"),
    )
    r = roc_auc(df, "s", F.col("y") == 1).collect()[0]
    assert r["auc"] == 1.0 and r["n_pos"] == r["n_neg"] == 500
    r_inv = roc_auc(df, "s", F.col("y") == 0).collect()[0]
    assert r_inv["auc"] == 0.0
    # constant score: every pair is a tie -> 0.5 exactly
    const = df.select(F.lit(1.0).alias("s"), "y")
    assert roc_auc(const, "s", F.col("y") == 1).collect()[0]["auc"] == 0.5


def test_auc_matches_sklearn_formula_small(spark):
    # hand-computed: scores [1,2,3,4], labels [0,0,1,1] with one tie pair
    rows = [(1.0, 0), (2.0, 0), (2.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = roc_auc(df, "s", F.col("y") == 1).collect()[0]
    # pairs: (2,1)+ (2,2: tie .5) (4,1)+ (4,2)+ -> 3.5/4
    assert abs(r["auc"] - 0.875) < 1e-9


def test_auc_degenerate_class_null(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    assert roc_auc(df, "s", F.col("y") == 1).collect()[0]["auc"] is None
