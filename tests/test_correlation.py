"""Correlation matrix tests (operators/correlation.py)."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators.correlation import correlation_matrix


def _corr_map(df):
    return {(r["col_a"], r["col_b"]): r for r in df.collect()}


def test_known_correlations(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
         (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0)],
        "a double, b double, c double, k double",
    )
    got = _corr_map(correlation_matrix(df, ["a", "b", "c", "k"]))
    assert got[("a", "b")]["corr"] == 1.0       # perfectly linear
    assert got[("a", "c")]["corr"] == -1.0      # perfectly anti-linear
    assert got[("a", "k")]["corr"] is None      # constant column
    assert got[("a", "b")]["n_pairs"] == 4
    assert len(got) == 6


def test_pairwise_null_deletion(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0, None), (2.0, 20.0, 1.0), (3.0, None, 2.0), (4.0, 40.0, 3.0)],
        "a double, b double, c double",
    )
    got = _corr_map(correlation_matrix(df, ["a", "b", "c"]))
    assert got[("a", "b")]["n_pairs"] == 3      # row 3 dropped
    assert got[("a", "c")]["n_pairs"] == 3      # row 1 dropped
    assert got[("b", "c")]["n_pairs"] == 2
    assert got[("a", "b")]["corr"] == 1.0


def test_single_fused_pass(spark):
    df = spark.range(100).selectExpr(
        "cast(id AS double) AS a", "cast(id * id AS double) AS b",
        "cast(id % 3 AS double) AS c"
    )
    plan = (
        correlation_matrix(df, ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1          # single-row exchange only
    assert plan.count("HashAggregate") == 2


def test_matches_spark_builtin(spark):
    """Sanity vs Spark's own corr() at 6 dp (different accumulation order,
    same statistic)."""
    import pyspark.sql.functions as F

    df = spark.range(1000).selectExpr(
        "cast(id AS double) AS a",
        "cast(pmod(id * 37 + 11, 101) AS double) AS b",
    )
    got = _corr_map(correlation_matrix(df, ["a", "b"]))[("a", "b")]["corr"]
    ref = df.select(F.corr("a", "b")).first()[0]
    assert abs(got - ref) < 1e-6


def test_spearman_monotone_and_inverse(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.spearman import spearman_matrix

    df = spark.createDataFrame(
        [(float(i), float(i * i), float(-i), 1.0) for i in range(1, 50)],
        "x double, y double, z double, c double",
    )
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in spearman_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0   # monotone nonlinear -> rank corr 1
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0


def test_spearman_ties_average_ranks(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.spearman import spearman_matrix

    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (2.0, 4.0)], "a double, b double"
    )
    r = spearman_matrix(df, ["a", "b"]).collect()[0]
    assert r["n_pairs"] == 4
    assert 0.8 < r["corr"] <= 1.0  # ties dilute but keep strong monotone
