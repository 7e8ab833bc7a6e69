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


def test_rollup_profile_adds_total_level(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.grouped_profile import (
        grouped_profile,
        rollup_profile,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), (None, 100.0)],
        "g string, v double",
    )
    rolled = rollup_profile(df, "g")
    seg = {
        (r.group_value, r.name): r.value
        for r in rolled.where("group_value IS DISTINCT FROM '<all>'").collect()
    }
    tot = {
        r.name: r.value
        for r in rolled.where("group_value = '<all>'").collect()
    }
    base = {
        (r.group_value, r.name): r.value
        for r in grouped_profile(df, "g").collect()
    }
    assert seg == base  # segment level identical to grouped_profile
    assert tot["Size"] == 4.0  # total level covers every row
    assert tot["Mean"] == 28.5
    # NULL segment is distinct from the total level
    assert (None, "Size") in seg and seg[(None, "Size")] == 1.0


def test_rollup_profile_single_pass(spark, lineitem):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.grouped_profile import rollup_profile

    plan = (
        rollup_profile(lineitem, "l_returnflag")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1  # one pass for both levels
    assert "Expand" in plan  # GROUPING SETS shape


def test_cube_profile_levels_consistent(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.grouped_profile import cube_profile

    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    m = cube_profile(df, "c_mktsegment", "c_nationkey")
    rows = [r for r in m.collect() if r["name"] == "Size"]
    total = {(r["group_a"], r["group_b"]): r["value"] for r in rows}
    n = df.count()
    assert total[("<all>", "<all>")] == n
    # each marginal sums to the grand total
    a_sum = sum(v for (a, b), v in total.items() if a != "<all>" and b == "<all>")
    b_sum = sum(v for (a, b), v in total.items() if a == "<all>" and b != "<all>")
    cell_sum = sum(v for (a, b), v in total.items() if a != "<all>" and b != "<all>")
    assert a_sum == b_sum == cell_sum == n
