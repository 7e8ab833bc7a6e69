"""Segmented profile tests (operators/grouped_profile.py)."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators.grouped_profile import grouped_profile


def _m(df):
    return {
        (r["group_value"], r["instance"], r["name"]): r["value"]
        for r in df.collect()
    }


def test_per_segment_metrics(spark):
    df = spark.createDataFrame(
        [("a", 1.0, "x"), ("a", 3.0, None), ("b", 10.0, "yy"), (None, 7.0, "z")],
        "seg string, v double, s string",
    )
    got = _m(grouped_profile(df, "seg"))
    assert got[("a", "*", "Size")] == 2.0
    assert got[("b", "*", "Size")] == 1.0
    assert got[(None, "*", "Size")] == 1.0          # NULL key is a segment
    assert got[("a", "v", "Mean")] == 2.0
    assert got[("a", "s", "Completeness")] == 0.5
    assert got[("b", "s", "MaxLength")] == 2.0
    assert got[(None, "v", "Sum")] == 7.0
    # the grouping column itself is not profiled
    assert not any(k[1] == "seg" for k in got)


def test_one_shuffle_plan(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "seg string, v double"
    )
    plan = (
        grouped_profile(df, "seg")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
