from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import outliers as OU
from data_profiler_for_aws_glue_data_catalog_spark.operators.numeric_histogram import (
    equi_depth_histograms,
)


def test_iqr_counts(spark):
    # 1..8 plus two extreme points; Q1=2.75, Q3=7.25 (linear interp on
    # the 10 values 1..8,100,-100 sorted), k=1.5
    vals = list(range(1, 9)) + [100, -100]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    r = OU.iqr_outliers(df, ["x"]).collect()[0]
    assert r.n_values == 10
    assert r.n_below == 1 and r.n_above == 1
    assert r.n_outliers == 2
    assert r.outlier_rate == 0.2
    assert r.lower_fence < 1 and r.upper_fence > 8


def test_no_outliers_uniform(spark):
    df = spark.createDataFrame([(float(v),) for v in range(100)], "x double")
    r = OU.iqr_outliers(df, ["x"]).collect()[0]
    assert r.n_outliers == 0


def test_multi_column_single_pass(spark, lineitem):
    rows = OU.iqr_outliers(lineitem, ["l_quantity", "l_extendedprice"]).collect()
    by_col = {r.column: r for r in rows}
    assert set(by_col) == {"l_quantity", "l_extendedprice"}
    # quantity is uniform 1..50: no Tukey outliers
    assert by_col["l_quantity"].n_outliers == 0


def test_equi_depth_bucket_sizes(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    rows = equi_depth_histograms(df, ["x"], n_bins=4).collect()
    assert sum(r.cnt for r in rows) == 100
    # near-equal buckets on a uniform column
    assert all(20 <= r.cnt <= 30 for r in rows)
    assert len(rows) == 4
    lo = min(r.lo for r in rows)
    hi = max(r.hi for r in rows)
    assert lo == 1.0 and hi == 100.0


def test_equi_depth_ratio_sums_to_one(spark, lineitem):
    rows = equi_depth_histograms(lineitem, ["l_extendedprice"], n_bins=10).collect()
    assert abs(sum(r.ratio for r in rows) - 1.0) < 1e-5


def test_winsorize_clips_tails(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import winsorize

    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    w = winsorize(df, ["x"], 0.1, 0.9)
    rows = [r.x for r in w.collect()]
    assert len(rows) == 100
    assert min(rows) >= 10.0 and max(rows) <= 91.0
    # interior values unchanged
    assert 50.0 in rows


def test_winsorize_preserves_schema_and_other_columns(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import winsorize

    df = spark.createDataFrame([(1, 5.0, "a"), (2, 500.0, "b")], "id bigint, v double, s string")
    w = winsorize(df, ["v"], 0.0, 1.0)
    assert w.columns == ["id", "v", "s"]
    assert {r.s for r in w.collect()} == {"a", "b"}


def test_profile_wide_pivot(spark, lineitem):
    from data_profiler_for_aws_glue_data_catalog_spark import ProfilerConfig, profile_table
    from data_profiler_for_aws_glue_data_catalog_spark.operators.wide_profile import profile_wide

    m = profile_table(lineitem, ProfilerConfig(), include_approx=False)
    wide = profile_wide(m)
    row = {r.instance: r for r in wide.collect()}["l_quantity"]
    assert row.Completeness == 1.0
    assert row.Minimum == 1.0 and row.Maximum == 50.0
    assert row.Sum is not None and row.Mean is not None


def test_extreme_rows_topk(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.extremes import extreme_rows

    rows = [(i, float(i % 7)) for i in range(50)] + [(100, 1000.0), (101, -1000.0)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = extreme_rows(df, "id", ["v"], k=3).collect()
    assert [r.id for r in got[:2]] == [100, 101] or {got[0].id, got[1].id} == {100, 101}
    assert abs(got[0].zscore) > abs(got[2].zscore)
    assert len(got) == 3


def test_extreme_rows_constant_column_empty(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.extremes import extreme_rows

    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id bigint, v double")
    assert extreme_rows(df, "id", ["v"], k=5).count() == 0


def test_mad_outliers_basic(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import mad_outliers

    vals = [10.0] * 20 + [11.0] * 20 + [9.0] * 20 + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = mad_outliers(df, ["x"]).collect()[0]
    assert r.median == 10.0
    assert r.mad == 1.0  # median |x - 10|
    assert r.n_outliers >= 1  # the 1000.0 point
    assert r.n_values == 61


def test_mad_vs_iqr_robustness(spark):
    """MAD fences stay tight when a quarter of the data is extreme."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import mad_outliers

    vals = [float(v) for v in range(100)] + [1e6] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = mad_outliers(df, ["x"]).collect()[0]
    assert r.n_outliers == 10
    assert r.upper_fence < 1e6
