from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import skew as SK


@pytest.fixture()
def skewed(spark):
    # key 'hot' x 6, 'a' x 2, 'b' x 1, NULL x 1
    rows = [("hot",)] * 6 + [("a",)] * 2 + [("b",)] + [(None,)]
    return spark.createDataFrame(rows, "k string")


def test_skew_summary_values(spark, skewed):
    r = SK.skew_summary(skewed, ["k"]).collect()[0]
    assert r.n_rows == 10
    assert r.n_keys == 4  # hot, a, b, NULL
    assert r.max_cnt == 6
    assert r.avg_cnt == pytest.approx(2.5)
    assert r.skew_ratio == pytest.approx(2.4)
    assert r.suggested_salt_buckets == 3
    # counts sorted: [1,1,2,6] -> p50 = 1.5 (interpolated)
    assert r.p50_cnt == pytest.approx(1.5)


def test_hot_keys_order_and_share(spark, skewed):
    rows = SK.hot_keys(skewed, ["k"], k=2).orderBy("cnt", ascending=False).collect()
    assert [(r.key_value, r.cnt) for r in rows] == [("hot", 6), ("a", 2)]
    assert rows[0].share == pytest.approx(0.6)


def test_hot_keys_null_group_counted(spark, skewed):
    rows = SK.hot_keys(skewed, ["k"], k=10).collect()
    assert any(r.key_value is None and r.cnt == 1 for r in rows)


def test_uniform_key_no_salting(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    r = SK.skew_summary(df, ["k"]).collect()[0]
    assert r.skew_ratio == pytest.approx(1.0)
    assert r.suggested_salt_buckets == 1


def test_multi_key_single_shuffle(spark, lineitem):
    """All key columns' frequencies ride one Expand + one aggregation."""
    plan = (
        SK.key_frequency(lineitem, ["l_orderkey", "l_partkey", "l_returnflag"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1


def test_trending_keys_per_window(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.trending import trending_keys

    d1, d2 = dt.datetime(2026, 1, 1, 10), dt.datetime(2026, 1, 2, 10)
    rows = (
        [(d1, "a")] * 3 + [(d1, "b")] * 2 + [(d1, "c")]
        + [(d2, "b")] * 4 + [(d2, "a")]
    )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {
        (r.window_start, r.rank): (r.key_value, r.cnt)
        for r in trending_keys(df, k=2).collect()
    }
    assert got[("2026-01-01 00:00:00", 1)] == ("a", 3)
    assert got[("2026-01-01 00:00:00", 2)] == ("b", 2)
    assert got[("2026-01-02 00:00:00", 1)] == ("b", 4)
    assert got[("2026-01-02 00:00:00", 2)] == ("a", 1)
    assert len(got) == 4  # k=2 caps each window


def test_pareto_analysis_concentration(spark):
    from pyspark.sql import functions as F

    from data_profiler_for_aws_glue_data_catalog_spark.operators.segments import pareto_analysis

    rows = [("a", 80.0)] + [("b", 10.0)] + [("c", 6.0)] + [("d", 4.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["key"]: r for r in pareto_analysis(df, "k", "v").collect()}
    assert out["a"]["rank"] == 1 and out["a"]["share"] == 0.8
    assert out["a"]["in_top80"] is True      # boundary key included
    assert out["b"]["in_top80"] is False     # prefix before b already >= 0.8
    assert out["d"]["cum_share"] == 1.0
