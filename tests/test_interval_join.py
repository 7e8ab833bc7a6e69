"""Bucketed interval join: containment semantics, bucket-boundary edges,
and plan shape (equi-join, no nested loop)."""

from __future__ import annotations

from datetime import datetime

from data_profiler_for_aws_glue_data_catalog_spark.operators.interval_join import interval_join

from tests.test_plans import plan_str


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, 1, datetime(2024, 1, 1, 0, 30, 0)),  # inside iv A
            (2, 1, datetime(2024, 1, 1, 1, 0, 0)),   # == A end: excluded
            (3, 1, datetime(2024, 1, 2, 0, 0, 0)),   # == B start: included
            (4, 1, datetime(2024, 1, 3, 12, 0, 0)),  # inside B (bucket 2 of 3)
            (5, 2, datetime(2024, 1, 1, 0, 30, 0)),  # other key, no ivals
            (6, 1, datetime(2024, 1, 9, 0, 0, 0)),   # outside everything
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            # A: 30 min inside one day-bucket
            (1, datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 1, 0, 0)),
            # B: spans three day-buckets
            (1, datetime(2024, 1, 2, 0, 0, 0), datetime(2024, 1, 4, 6, 0, 0)),
        ],
        "user_id bigint, session_start timestamp, session_end timestamp",
    )
    return points, intervals


def test_interval_join_containment(spark):
    points, intervals = _frames(spark)
    got = {
        (r["event_id"], r["session_start"])
        for r in interval_join(points, intervals).collect()
    }
    assert got == {
        (1, datetime(2024, 1, 1, 0, 0, 0)),
        (3, datetime(2024, 1, 2, 0, 0, 0)),
        (4, datetime(2024, 1, 2, 0, 0, 0)),
    }


def test_interval_join_no_duplicate_matches(spark):
    """A point inside a multi-bucket interval matches exactly once."""
    points, intervals = _frames(spark)
    rows = interval_join(points, intervals).collect()
    assert len(rows) == len({(r["event_id"], r["session_start"]) for r in rows})


def test_interval_join_is_equi_join(spark):
    points, intervals = _frames(spark)
    p = plan_str(interval_join(points, intervals))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
