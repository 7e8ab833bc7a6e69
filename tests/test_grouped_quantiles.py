from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import grouped_quantiles as GQ


def _get(df):
    return {
        (r.group_value, r.value_col, r.p): r.quantile for r in df.collect()
    }


def test_interpolated_medians_per_group(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = _get(GQ.grouped_quantiles(df, "g", ["v"], [0.5]))
    assert got[("a", "v", 0.5)] == pytest.approx(2.0)
    assert got[("b", "v", 0.5)] == pytest.approx(15.0)  # interpolated


def test_quartile_interpolation(spark):
    df = spark.createDataFrame([("a", float(i)) for i in range(1, 5)], "g string, v double")
    got = _get(GQ.grouped_quantiles(df, "g", ["v"], [0.25, 1.0]))
    # values [1,2,3,4]: p=0.25 -> 1 + 0.75 = 1.75 (linear interpolation)
    assert got[("a", "v", 0.25)] == pytest.approx(1.75)
    assert got[("a", "v", 1.0)] == pytest.approx(4.0)


def test_null_values_excluded_null_group_kept(spark):
    rows = [("a", 1.0), ("a", None), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = _get(GQ.grouped_quantiles(df, "g", ["v"], [0.5]))
    assert got[("a", "v", 0.5)] == pytest.approx(1.0)
    assert got[(None, "v", 0.5)] == pytest.approx(6.0)


def test_multi_column_single_shuffle(spark, lineitem):
    plan = (
        GQ.grouped_quantiles(
            lineitem, "l_returnflag", ["l_quantity", "l_tax"], [0.5, 0.9]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1


def test_approx_mode_runs_and_is_close(spark, lineitem):
    exact = _get(
        GQ.grouped_quantiles(lineitem, "l_returnflag", ["l_quantity"], [0.5])
    )
    approx = _get(
        GQ.grouped_quantiles(
            lineitem, "l_returnflag", ["l_quantity"], [0.5], exact=False
        )
    )
    for k, v in exact.items():
        assert approx[k] == pytest.approx(v, rel=0.05)
