from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators.column_match import duplicate_columns
from data_profiler_for_aws_glue_data_catalog_spark.operators.scd2 import scd2_merge
from data_profiler_for_aws_glue_data_catalog_spark.operators.topk import topk_per_group
from data_profiler_for_aws_glue_data_catalog_spark.operators.trend import trend_slopes


def test_trend_slope_exact_line(spark):
    # y = 2*t_days + 5 for user 1; constant for user 2
    rows = []
    for d in range(5):
        rows.append((1, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 2.0 * d + 5))
        rows.append((2, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 7.0))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {r.entity: r for r in trend_slopes(df).collect()}
    assert got[1].slope_per_day == pytest.approx(2.0, abs=1e-5)
    assert got[1].intercept == pytest.approx(5.0, abs=1e-4)
    assert got[2].slope_per_day == pytest.approx(0.0, abs=1e-6)
    assert got[1].n_points == 5


def test_trend_single_point_null_slope(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 3.0)], "user_id bigint, ts timestamp, value double"
    )
    r = trend_slopes(df).collect()[0]
    assert r.slope_per_day is None


def test_topk_per_group(spark):
    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)]
    df = spark.createDataFrame(rows, "g string, id bigint, v double")
    got = topk_per_group(df, "g", "v", 2, tie_col="id").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r.id)
    assert by_g["a"] == [2, 3]
    assert by_g["b"] == [4]


def test_duplicate_columns_match(spark):
    t1 = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, a string")
    t2 = spark.createDataFrame([("y", 9), ("x", 8)], "a2 string, z bigint")
    got = duplicate_columns(spark, {"t1": t1, "t2": t2}).collect()
    pairs = {(r.table_a, r.column_a, r.table_b, r.column_b) for r in got}
    assert ("t1", "a", "t2", "a2") in pairs
    # id {1,2} vs z {8,9} must NOT match
    assert ("t1", "id", "t2", "z") not in pairs


def test_scd2_merge_kinds(spark):
    old = spark.createDataFrame(
        [(1, "alice", "gold"), (2, "bob", "basic"), (3, "carol", "basic")],
        "id bigint, name string, tier string",
    )
    new = spark.createDataFrame(
        [(1, "alice", "gold"), (2, "bob", "silver"), (4, "dave", "basic")],
        "id bigint, name string, tier string",
    )
    got = scd2_merge(
        old, new, ["id"], ["name", "tier"], "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    ).collect()
    kinds = {(r.id, r.change_kind): r for r in got}
    assert kinds[(1, "kept")].valid_to is None
    assert kinds[(2, "closed")].tier == "basic"
    assert kinds[(2, "closed")].valid_to == "2024-02-01 00:00:00"
    assert kinds[(2, "opened")].tier == "silver"
    assert kinds[(4, "opened")].valid_from == "2024-02-01 00:00:00"
    assert kinds[(3, "closed")].name == "carol"
    assert len(got) == 5  # kept, closed+opened (id 2), closed (3), opened (4)


def test_period_over_period_pct(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from data_profiler_for_aws_glue_data_catalog_spark.operators.trend import period_over_period

    t0 = dt.datetime(2026, 1, 1)  # Thursday; weekly epoch buckets
    rows = [
        (1, t0, "k", 10.0),
        (2, t0 + dt.timedelta(days=7), "k", 15.0),
        (3, t0 + dt.timedelta(days=14), "k", 7.5),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = sorted(
        period_over_period(df, "ts", "value", "event_type").collect(),
        key=lambda r: r["week_start"],
    )
    assert out[0]["wow_pct"] is None
    assert out[1]["wow_pct"] == 50.0
    assert out[2]["wow_pct"] == -50.0
