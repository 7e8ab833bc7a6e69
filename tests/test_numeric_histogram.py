"""Equi-width numeric histogram tests (operators/numeric_histogram.py)."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators.numeric_histogram import (
    numeric_histograms,
)


def test_bucketing_and_bounds(spark):
    df = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    rows = {r["bucket"]: r for r in numeric_histograms(df, ["v"], n_bins=3).collect()}
    # width = 3, buckets [0,3) [3,6) [6,9]: counts 3, 3, 4 (max closes last)
    assert {b: rows[b]["cnt"] for b in rows} == {0: 3, 1: 3, 2: 4}
    assert rows[0]["lo"] == 0.0 and rows[0]["hi"] == 3.0
    assert rows[2]["hi"] == 9.0
    assert abs(sum(r["ratio"] for r in rows.values()) - 1.0) < 1e-9


def test_constant_and_null_columns(spark):
    df = spark.createDataFrame(
        [(5.0, None), (5.0, None), (None, None)], "c double, z double"
    )
    out = numeric_histograms(df, ["c", "z"], n_bins=4).collect()
    by_inst = {}
    for r in out:
        by_inst.setdefault(r["instance"], []).append(r)
    (c_row,) = by_inst["c"]  # constant column: single bucket 0
    assert c_row["bucket"] == 0 and c_row["cnt"] == 2
    assert c_row["lo"] == c_row["hi"] == 5.0
    assert "z" not in by_inst  # all-null column: no rows


def test_fused_strategy_plan(spark):
    """Small bins x cols: one stats agg broadcast in + one fused count
    agg — no row explosion, no hash-partition shuffle."""
    df = spark.range(1000).selectExpr(
        "cast(id AS double) AS a", "cast(id % 7 AS double) AS b"
    )
    plan = (
        numeric_histograms(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastExchange") == 1
    assert plan.count("Exchange hashpartitioning") == 0
    # the only Generate is the single-row unpivot ABOVE the aggregation
    # (top-down print) — bucket counting never explodes input rows
    assert plan.count("Generate") == 1
    assert plan.index("Generate") < plan.index("HashAggregate")


def test_explode_strategy_plan_and_equivalence(spark):
    """Large bins force the explode shape; both strategies agree."""
    df = spark.range(1000).selectExpr(
        "cast(id AS double) AS a", "cast(id % 7 AS double) AS b"
    )
    wide = numeric_histograms(df, ["a", "b"], n_bins=200)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1

    from data_profiler_for_aws_glue_data_catalog_spark.operators.numeric_histogram import (
        _histograms_fused,
    )

    got = {tuple(r) for r in wide.collect()}
    ref = {tuple(r) for r in _histograms_fused(df, ["a", "b"], 200).collect()}
    assert got == ref
