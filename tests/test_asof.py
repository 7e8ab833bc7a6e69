"""As-of join: boundary semantics and plan shape."""

from __future__ import annotations

from datetime import datetime

from data_profiler_for_aws_glue_data_catalog_spark.operators.asof import asof_join

from tests.test_plans import plan_str


def _frames(spark):
    L = spark.createDataFrame(
        [
            (10, 1, datetime(2024, 1, 1, 1, 0, 0)),   # after views 1+2
            (11, 1, datetime(2024, 1, 1, 2, 0, 0)),   # exactly at view 3
            (12, 2, datetime(2024, 1, 1, 0, 30, 0)),  # no preceding view
            (13, 3, datetime(2024, 1, 1, 9, 0, 0)),   # key with no views
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    R = spark.createDataFrame(
        [
            # two views at the SAME (user, ts): max event_id must win
            (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
            (2, 1, datetime(2024, 1, 1, 0, 0, 0), 2.0),
            (3, 1, datetime(2024, 1, 1, 2, 0, 0), 3.0),
            (4, 2, datetime(2024, 1, 1, 1, 0, 0), 4.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    return L, R


def test_asof_semantics(spark):
    L, R = _frames(spark)
    got = {
        r["event_id"]: (r["event_id_matched"], r["value_matched"])
        for r in asof_join(L, R).collect()
    }
    assert got == {
        10: (2, 2.0),      # tie at same ts -> larger event_id
        11: (3, 3.0),      # inclusive: right row AT left ts matches
        12: (None, None),  # right rows exist for key but all later
        13: (None, None),  # no right rows for key at all
    }


def test_asof_is_single_shuffle_no_join(spark):
    L, R = _frames(spark)
    p = plan_str(asof_join(L, R), "simple")
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") == 1
