from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import retention as RT


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2026, 1, d, h)) for u, d, h in rows],
        "user_id bigint, ts timestamp",
    )


def _matrix(spark, rows, **kw):
    return {
        (r.cohort_day, r.day_offset): (r.n_active, r.cohort_size, r.retention)
        for r in RT.cohort_retention(_ev(spark, rows), **kw).collect()
    }


def test_basic_retention_matrix(spark):
    rows = [
        (1, 1, 0), (1, 2, 0),          # user 1: day1 cohort, back day2
        (2, 1, 5),                      # user 2: day1 cohort only
        (3, 2, 0), (3, 4, 0),          # user 3: day2 cohort, back day4
    ]
    got = _matrix(spark, rows)
    assert got[("2026-01-01", 0)] == (2, 2, 1.0)
    assert got[("2026-01-01", 1)] == (1, 2, 0.5)
    assert got[("2026-01-02", 0)] == (1, 1, 1.0)
    assert got[("2026-01-02", 2)] == (1, 1, 1.0)
    assert ("2026-01-02", 1) not in got  # no activity that day


def test_same_day_events_counted_once(spark):
    rows = [(1, 1, 0), (1, 1, 5), (1, 1, 12)]
    got = _matrix(spark, rows)
    assert got[("2026-01-01", 0)] == (1, 1, 1.0)
    assert len(got) == 1


def test_max_offset_caps_output(spark):
    rows = [(1, 1, 0), (1, 20, 0)]
    got = _matrix(spark, rows, max_offset=7)
    assert set(got) == {("2026-01-01", 0)}


def test_retention_never_exceeds_one(spark, lineitem):
    rows = [(u, d, 0) for u in (1, 2, 3) for d in (1, 2, 3)]
    got = _matrix(spark, rows)
    assert all(v[2] <= 1.0 for v in got.values())
