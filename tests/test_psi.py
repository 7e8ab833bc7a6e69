from __future__ import annotations

import math

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import psi as P


def _df(spark, vals, col="v"):
    return spark.createDataFrame([(float(x),) for x in vals], f"{col} double")


def test_identical_distributions_near_zero(spark):
    ref = _df(spark, range(100))
    r = {x.column: x for x in P.psi(ref, ref, ["v"]).collect()}["v"]
    assert r.psi == pytest.approx(0.0, abs=1e-9)
    assert r.drift_class == "stable"


def test_shifted_distribution_flags(spark):
    ref = _df(spark, range(100))
    cur = _df(spark, [x + 80 for x in range(100)])  # mass clamps right
    r = P.psi(ref, cur, ["v"]).collect()[0]
    assert r.psi > 0.25
    assert r.drift_class == "shifted"


def test_psi_manual_two_buckets(spark):
    # ref: 50/50 across [0, 2); cur: 100/0 -> closed-form PSI
    ref = _df(spark, [0.5] * 50 + [1.5] * 50)
    cur = _df(spark, [0.5] * 100)
    r = P.psi(ref, cur, ["v"], bins=2).collect()[0]
    e = P.EPS
    p1, q1 = 0.5 + e, 1.0 + e
    p2, q2 = 0.5 + e, 0.0 + e
    expect = (p1 - q1) * math.log(p1 / q1) + (p2 - q2) * math.log(p2 / q2)
    assert r.psi == pytest.approx(expect, abs=1e-6)


def test_constant_reference_undefined(spark):
    ref = _df(spark, [3.0] * 10)
    cur = _df(spark, range(10))
    r = P.psi(ref, cur, ["v"]).collect()[0]
    assert r.psi is None
    assert r.drift_class == "undefined"


def test_out_of_range_values_clamp(spark):
    ref = _df(spark, range(10))
    cur = _df(spark, [-100.0, 100.0])  # both clamp into edge buckets
    r = P.psi(ref, cur, ["v"]).collect()[0]
    assert r.psi is not None and math.isfinite(r.psi)
