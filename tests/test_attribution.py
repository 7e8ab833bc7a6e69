"""touch_attribution first/last credit semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.attribution import touch_attribution

T0 = dt.datetime(2026, 1, 2, 12, 0, 0)


def _ev(i, minutes, typ, user=1):
    return (i, T0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_first_last_touch_window(spark):
    rows = [
        _ev(1, -60 * 30, "click"),      # outside 24h lookback
        _ev(2, -120, "view"),           # first touch in window
        _ev(3, -30, "click"),           # last touch
        _ev(4, 0, "purchase"),          # conversion
        _ev(5, 10, "click"),            # after conversion: no credit
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    r = touch_attribution(df).collect()[0]
    assert r["conv_id"] == 4
    assert r["first_touch_id"] == 2 and r["first_touch_type"] == "view"
    assert r["last_touch_id"] == 3 and r["last_touch_type"] == "click"
    assert r["n_touches"] == 2


def test_conversion_without_touches_kept(spark):
    df = spark.createDataFrame([_ev(1, 0, "purchase")], SCHEMA)
    r = touch_attribution(df).collect()[0]
    assert r["first_touch_id"] is None and r["n_touches"] == 0


def test_cross_user_isolation(spark):
    rows = [
        _ev(1, -10, "click", user=1),
        _ev(2, 0, "purchase", user=2),  # other user's click must not credit
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    r = touch_attribution(df).collect()[0]
    assert r["n_touches"] == 0
