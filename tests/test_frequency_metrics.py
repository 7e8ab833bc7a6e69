"""Frequency-table metrics: nulls, ties, histogram labels, property checks
(Uniqueness <= Distinctness <= 1, Entropy <= ln(CountDistinct))."""

from __future__ import annotations

import math

from data_profiler_for_aws_glue_data_catalog_spark import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators.frequency_metrics import (
    frequency_metrics_long,
)
from data_profiler_for_aws_glue_data_catalog_spark.operators.profile import (
    profile_table,
)
from tests.conftest import metrics_dict


def _freq_metrics(spark, values, n_bins=10):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    cfg = ProfilerConfig(compute_expensive=True, n_bins=n_bins)
    return metrics_dict(frequency_metrics_long(df, "s", "string", cfg).collect())


def test_known_distribution(spark):
    # a,a,a,b,b,c,NULL -> 6 non-null rows, 3 distinct, 1 singleton
    m = _freq_metrics(spark, ["a", "a", "a", "b", "b", "c", None])
    assert m[("s", "CountDistinct")] == 3.0
    # Distinctness moved to the scan passes (every column, every mode)
    assert ("s", "Distinctness") not in m
    assert abs(m[("s", "Uniqueness")] - 1 / 6) < 1e-15
    assert abs(m[("s", "UniqueValueRatio")] - 1 / 3) < 1e-15
    expected_h = -(3 / 6 * math.log(3 / 6) + 2 / 6 * math.log(2 / 6) + 1 / 6 * math.log(1 / 6))
    assert abs(m[("s", "Entropy")] - expected_h) < 1e-12
    # histogram: null bucket is a first-class bin labeled NullValue
    assert m[("s", "Histogram.bins")] == 4.0
    assert m[("s", "Histogram.abs.a")] == 3.0
    assert m[("s", "Histogram.abs.NullValue")] == 1.0
    assert abs(m[("s", "Histogram.ratio.a")] - 3 / 7) < 1e-15


def test_histogram_topk_and_tiebreak(spark):
    # 5 values tie on count=2; bins=3 keeps lexicographically-first labels
    vals = [v for v in "edcba" for _ in range(2)]
    m = _freq_metrics(spark, vals, n_bins=3)
    assert m[("s", "Histogram.bins")] == 3.0
    assert ("s", "Histogram.abs.a") in m
    assert ("s", "Histogram.abs.b") in m
    assert ("s", "Histogram.abs.c") in m
    assert ("s", "Histogram.abs.d") not in m


def test_all_unique(spark):
    m = _freq_metrics(spark, ["x", "y", "z"])
    assert m[("s", "Uniqueness")] == 1.0
    assert m[("s", "UniqueValueRatio")] == 1.0
    assert abs(m[("s", "Entropy")] - math.log(3)) < 1e-12


def test_property_invariants_on_real_data(spark, lineitem):
    cfg = ProfilerConfig(compute_expensive=True)
    m = metrics_dict(profile_table(lineitem, cfg).collect())
    for c in ("l_returnflag", "l_linestatus"):
        assert 0.0 <= m[(c, "Uniqueness")] <= m[(c, "Distinctness")] <= 1.0
        assert m[(c, "Entropy")] <= math.log(m[(c, "CountDistinct")]) + 1e-12
        assert m[(c, "MinLength")] <= m[(c, "MaxLength")]
        assert 0.0 <= m[(c, "Completeness")] <= 1.0
