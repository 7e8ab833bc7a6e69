from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import inclusion as IN


def _cols(spark, left_vals, right_vals):
    l = spark.createDataFrame([(v,) for v in left_vals], "a string")
    r = spark.createDataFrame([(v,) for v in right_vals], "b string")
    return IN.inclusion_stats(l, "a", r, "b", "lt", "rt").collect()[0]


def test_subset(spark):
    r = _cols(spark, ["x", "y", "x"], ["x", "y", "z"])
    assert (r.n_left, r.n_right, r.n_common) == (2, 3, 2)
    assert r.containment_lr == 1.0
    assert r.containment_rl == pytest.approx(2 / 3, abs=1e-6)
    assert r.jaccard == pytest.approx(2 / 3, abs=1e-6)


def test_disjoint(spark):
    r = _cols(spark, ["a"], ["b"])
    assert r.n_common == 0
    assert r.jaccard == 0.0


def test_nulls_excluded(spark):
    r = _cols(spark, ["a", None], ["a", None, "b"])
    assert (r.n_left, r.n_right) == (1, 2)


def test_cross_type_string_compare(spark):
    l = spark.createDataFrame([(1,), (2,)], "a bigint")
    r = spark.createDataFrame([("1",), ("3",)], "b string")
    row = IN.inclusion_stats(l, "a", r, "b", "lt", "rt").collect()[0]
    assert row.n_common == 1
