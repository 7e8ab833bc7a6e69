from __future__ import annotations

import math

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import association as AS
from data_profiler_for_aws_glue_data_catalog_spark.operators import benford as BF


def test_perfect_association(spark):
    # b is a function of a -> V = 1
    rows = [("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = AS.cramers_v(df, "a", "b").collect()[0]
    assert r.cramers_v == pytest.approx(1.0, abs=1e-5)
    assert (r.r, r.c, r.n_rows) == (2, 2, 4)


def test_independence_is_near_zero(spark):
    # perfectly balanced independent columns -> chi2 = 0
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = AS.cramers_v(df, "a", "b").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-5)
    assert r.cramers_v == pytest.approx(0.0, abs=1e-5)


def test_null_rows_excluded(spark):
    rows = [("x", "p"), (None, "p"), ("x", None), ("y", "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = AS.cramers_v(df, "a", "b").collect()[0]
    assert r.n_rows == 2


def test_benford_uniform_1_to_9(spark):
    df = spark.createDataFrame([(float(d),) for d in range(1, 10)], "x double")
    got = {r.digit: r for r in BF.benford_digits(df, ["x"]).collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d].observed_p == pytest.approx(1 / 9, abs=1e-5)
        assert got[d].expected_p == pytest.approx(
            math.log10(1 + 1 / d), abs=1e-5
        )


def test_benford_first_digit_extraction(spark):
    # 0.052 -> 5; -300 -> 3; 0 and NULL excluded
    df = spark.createDataFrame(
        [(0.052,), (-300.0,), (0.0,), (None,)], "x double"
    )
    got = {r.digit: r.n for r in BF.benford_digits(df, ["x"]).collect()}
    assert got == {5: 1, 3: 1}
