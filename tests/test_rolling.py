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


def test_resample_ohlc_semantics(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.resample import resample_ohlc

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (1, t0 + dt.timedelta(minutes=5), "k", 3.0),
        (2, t0 + dt.timedelta(minutes=20), "k", 9.0),
        (3, t0 + dt.timedelta(minutes=50), "k", 1.0),
        (4, t0 + dt.timedelta(minutes=70), "k", 7.0),  # next hour
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r["bucket_start"]: r for r in
           resample_ohlc(df, "ts", "value", "event_type", "event_id").collect()}
    b0 = out[t0]
    assert (b0["open"], b0["high"], b0["low"], b0["close"]) == (3.0, 9.0, 1.0, 1.0)
    assert b0["vsum"] == 13.0 and b0["n"] == 3
    assert out[t0 + dt.timedelta(hours=1)]["open"] == 7.0


def test_fill_time_gaps_forward_fill(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.resample import fill_time_gaps

    t0 = dt.datetime(2026, 1, 1)
    b = spark.createDataFrame(
        [("k", t0, 1.0), ("k", t0 + dt.timedelta(hours=3), 4.0)],
        "key string, bucket_start timestamp, value double",
    )
    rows = sorted(fill_time_gaps(b).collect(), key=lambda r: r["bucket_start"])
    assert len(rows) == 4  # hours 0..3 dense
    assert [r["value"] for r in rows] == [1.0, 1.0, 1.0, 4.0]
    assert [r["is_filled"] for r in rows] == [False, True, True, False]
