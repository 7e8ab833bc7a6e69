from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators.cooccurrence import cooccurrence_topk
from data_profiler_for_aws_glue_data_catalog_spark.operators.format_patterns import format_patterns
from data_profiler_for_aws_glue_data_catalog_spark.operators.fuzzy_join import fuzzy_join
from data_profiler_for_aws_glue_data_catalog_spark.operators.row_dedup import duplicate_rows
from data_profiler_for_aws_glue_data_catalog_spark.operators.temporal import temporal_profile


def test_format_patterns_masks(spark):
    df = spark.createDataFrame(
        [("AB-12",), ("XY-99",), ("ab12",), (None,)], "code string"
    )
    got = {r.mask: r for r in format_patterns(df, ["code"], k=5).collect()}
    assert got["A-9"].cnt == 2  # runs collapse: AB->A, 12->9
    assert got["a9"].cnt == 1
    assert got["A-9"].rank == 1
    assert got["A-9"].ratio == pytest.approx(2 / 3, abs=1e-6)


def test_format_patterns_topk_limit(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(10)], "s string")
    rows = format_patterns(df, ["s"], k=1).collect()
    assert len(rows) == 1


def test_temporal_profile_buckets(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 9, 0), 1.0),   # Monday
        (dt.datetime(2024, 1, 1, 9, 30), 2.0),
        (dt.datetime(2024, 1, 7, 23, 0), 4.0),  # Sunday
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {(r.dimension, r.bucket): r for r in temporal_profile(df).collect()}
    assert got[("hour", 9)].n_events == 2
    assert got[("hour", 9)].value_sum == 3.0
    assert got[("dow", 2)].n_events == 2   # Spark dayofweek: Monday=2
    assert got[("dow", 1)].n_events == 1   # Sunday=1
    hour_frac = sum(r.frac for (d, _), r in got.items() if d == "hour")
    assert hour_frac == pytest.approx(1.0, abs=1e-5)


def test_cooccurrence_pairs(spark):
    rows = [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "g bigint, item string")
    got = cooccurrence_topk(df, "g", "item", k=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.item1, r.item2, r.n_groups) == ("a", "b", 2)
    assert r.support == pytest.approx(2 / 3, abs=1e-6)


def test_fuzzy_join_blocked(spark):
    rows = [(1, "red widget"), (2, "red widgit"), (3, "red bolt"), (4, "xyz")]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = fuzzy_join(df, "id", "name", max_distance=2).collect()
    pairs = {(r.id1, r.id2): r.distance for r in got}
    assert pairs == {(1, 2): 1}  # widgit ~ widget; bolt too far / other block


def test_duplicate_rows_summary(spark):
    rows = [(1, "a"), (1, "a"), (2, None), (2, None), (3, "c")]
    df = spark.createDataFrame(rows, "k bigint, s string")
    r = duplicate_rows(df).collect()[0]
    assert (r.n_rows, r.n_distinct_rows) == (5, 3)
    assert r.n_dup_rows == 4
    assert r.n_redundant == 2
    assert r.dup_rate == 0.4


def test_duplicate_rows_no_concat_collision(spark):
    df = spark.createDataFrame([("ab", "c"), ("a", "bc")], "x string, y string")
    r = duplicate_rows(df).collect()[0]
    assert r.n_distinct_rows == 2
