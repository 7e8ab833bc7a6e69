from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import json_profile as JP


def _by_key(df):
    return {r.key: r for r in df.collect()}


def test_key_discovery_and_type_histogram(spark):
    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "c": true}',),
        ('{"a": 3}',),
    ]
    df = spark.createDataFrame(rows, "props string")
    got = _by_key(JP.json_profile(df, "props"))
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert a.n_present == 3
    assert a.presence_ratio == pytest.approx(1.0)
    assert (a.n_integral, a.n_fractional) == (2, 1)
    assert got["b"].n_other == 1  # "x" is neither bool nor numeric
    assert got["c"].n_boolean == 1
    assert got["c"].presence_ratio == pytest.approx(1 / 3)


def test_invalid_and_null_json_rows_skipped(spark):
    rows = [('{"a": 1}',), ("not json",), (None,)]
    df = spark.createDataFrame(rows, "props string")
    got = _by_key(JP.json_profile(df, "props"))
    assert set(got) == {"a"}
    assert got["a"].n_present == 1
    # ratio denominator counts ALL rows, parseable or not
    assert got["a"].presence_ratio == pytest.approx(1 / 3)


def test_nested_objects_counted_as_other(spark):
    df = spark.createDataFrame([('{"o": {"x": 1}, "l": [1, 2]}',)], "props string")
    got = _by_key(JP.json_profile(df, "props"))
    assert got["o"].n_other == 1
    assert got["l"].n_other == 1


def test_single_shuffle(spark):
    df = spark.createDataFrame([('{"a": 1}',)] * 100, "props string")
    plan = JP.json_profile(df, "props")._jdf.queryExecution().executedPlan().toString()
    # one aggregation exchange; the total-count side is a broadcast
    assert plan.count("Exchange hashpartitioning") <= 1
