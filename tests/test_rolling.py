from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import rolling as RL


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


def test_trailing_range_window(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(days=1), 20.0),
        (1, t0 + dt.timedelta(days=10), 30.0),  # outside 7d of first two
    ]
    got = {
        r.ts: (r.w_count, r.w_sum, r.w_mean)
        for r in RL.rolling_stats(_ev(spark, rows)).collect()
    }
    assert got[t0] == (1, 10.0, 10.0)
    assert got[t0 + dt.timedelta(days=1)] == (2, 30.0, 15.0)
    assert got[t0 + dt.timedelta(days=10)] == (1, 30.0, 30.0)


def test_boundary_inclusive(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, 1.0), (1, t0 + dt.timedelta(seconds=7 * 86400), 2.0)]
    got = {
        r.ts: r.w_count for r in RL.rolling_stats(_ev(spark, rows)).collect()
    }
    # exactly window_seconds apart -> still inside the RANGE frame
    assert got[t0 + dt.timedelta(seconds=7 * 86400)] == 2


def test_entities_isolated(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, 1.0), (2, t0, 100.0)]
    got = {
        r.entity_id: r.w_sum for r in RL.rolling_stats(_ev(spark, rows)).collect()
    }
    assert got[1] == 1.0 and got[2] == 100.0


def test_null_values_dont_count(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, 5.0), (1, t0 + dt.timedelta(hours=1), None)]
    r = sorted(
        RL.rolling_stats(_ev(spark, rows)).collect(), key=lambda x: x.ts
    )[1]
    assert r.w_count == 1 and r.w_sum == 5.0 and r.w_mean == pytest.approx(5.0)


def test_one_shuffle(spark, spark_events=None):
    t0 = dt.datetime(2026, 1, 1)
    df = _ev(spark, [(i % 3, t0 + dt.timedelta(minutes=i), float(i)) for i in range(100)])
    plan = RL.rolling_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
