"""Unit tests for the fused scan-agg metrics (SURVEY.md §5.2):
adversarial inputs — all-null column, empty table, single row, decimals,
boolean/date conversion path, quote-in-name columns."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators.scan_metrics import (
    scan_metrics_long,
)
from tests.conftest import metrics_dict


def test_basic_numeric_and_text(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "bb"), (3, None), (None, "dddd")],
        "x int, s string",
    )
    m = metrics_dict(scan_metrics_long(df, ProfilerConfig()).collect())
    assert m[("*", "Size")] == 4.0
    assert m[("x", "Completeness")] == 0.75
    assert m[("x", "Minimum")] == 1.0
    assert m[("x", "Maximum")] == 3.0
    assert m[("x", "Sum")] == 6.0
    assert m[("x", "Mean")] == 2.0
    # population stddev of [1,2,3] = sqrt(2/3)
    assert abs(m[("x", "StandardDeviation")] - math.sqrt(2 / 3)) < 1e-12
    assert m[("s", "MinLength")] == 1.0
    assert m[("s", "MaxLength")] == 4.0
    assert m[("s", "Completeness")] == 0.75
    assert m[("x", "ApproxCountDistinct")] == 3.0


def test_all_null_column(spark):
    df = spark.createDataFrame([Row(x=None), Row(x=None)], "x double")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("*", "Size")] == 2.0
    assert m[("x", "Completeness")] == 0.0
    assert m[("x", "Sum")] is None
    assert m[("x", "Mean")] is None
    assert m[("x", "StandardDeviation")] is None


def test_empty_table(spark):
    df = spark.createDataFrame([], "x double, s string")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("*", "Size")] == 0.0
    assert m[("x", "Sum")] is None


def test_single_row(spark):
    df = spark.createDataFrame([(5.0,)], "x double")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("x", "Mean")] == 5.0
    assert m[("x", "StandardDeviation")] == 0.0


def test_decimal_column_profiled_as_numeric(spark):
    df = spark.createDataFrame([(1.5,), (2.5,)], "x double").select(
        F.col("x").cast("decimal(10,2)").alias("x")
    )
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("x", "Sum")] == 4.0
    assert m[("x", "Mean")] == 2.0


def test_boolean_date_convert_path(spark):
    df = spark.createDataFrame(
        [(True, "2020-01-01"), (False, "2020-01-02"), (None, None)],
        "b boolean, d string",
    ).select("b", F.col("d").cast("date").alias("d"))
    skip = scan_metrics_long(df, ProfilerConfig())
    assert {r["instance"] for r in skip.collect()} == {"*"}
    m = metrics_dict(
        scan_metrics_long(df, ProfilerConfig(profile_unsupported_types=True)).collect()
    )
    assert m[("b", "MaxLength")] == 5.0  # 'false'
    assert m[("b", "MinLength")] == 4.0  # 'true'
    assert m[("d", "MaxLength")] == 10.0
    assert abs(m[("b", "Completeness")] - 2 / 3) < 1e-15


def test_timestamp_skipped_by_default(spark, lineitem):
    m = scan_metrics_long(lineitem).collect()
    assert ("l_shipdate", "Completeness") not in metrics_dict(m)


def test_quantiles_present_and_monotone(spark, lineitem):
    m = metrics_dict(scan_metrics_long(lineitem).collect())
    qs = [m[("l_quantity", f"ApproxQuantiles-{i / 10!r}")] for i in range(1, 11)]
    assert qs == sorted(qs)
    assert m[("l_quantity", "ApproxQuantiles-1.0")] == m[("l_quantity", "Maximum")]


def test_distinctness_all_columns_default_mode(spark):
    # reference parity: Distinctness for BOTH numeric and text columns,
    # WITHOUT compute_expensive (Main.scala:318,342)
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (None, "b")], "x int, s string"
    )
    m = metrics_dict(scan_metrics_long(df, ProfilerConfig()).collect())
    assert m[("x", "Distinctness")] == 2 / 3  # 2 distinct over 3 non-null
    assert m[("s", "Distinctness")] == 2 / 3
    all_null = spark.createDataFrame([Row(x=None)], "x double")
    mn = metrics_dict(scan_metrics_long(all_null).collect())
    assert mn[("x", "Distinctness")] is None


def test_decimal_overflow_guard_large_values(spark):
    # |x| >= 1e12 overflows the SQ decimal domain; the guard must switch
    # StandardDeviation to the IEEE fallback instead of failing the ANSI
    # cast or silently dropping rows (ADVICE r01).
    vals = [1.0e15, 2.0e15, 3.0e15]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("x", "Sum")] == sum(vals)
    assert m[("x", "Mean")] == sum(vals) / 3
    expected_sd = math.sqrt(sum((v - 2.0e15) ** 2 for v in vals) / 3)
    assert abs(m[("x", "StandardDeviation")] - expected_sd) / expected_sd < 1e-12


def test_decimal_overflow_guard_huge_sum(spark):
    # values above the SUM decimal domain (>= 1e21)
    vals = [1.0e22, 2.0e22]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("x", "Sum")] == 3.0e22
    assert m[("x", "Mean")] == 1.5e22


def test_decimal_resolution_floor_tiny_values(spark):
    # A column entirely below the 6-dp resolution (0 < max|x| < 1e-3) must
    # take the IEEE branch: the decimal path would round every value to 0
    # and report Mean = 0.0 OUTSIDE [Minimum, Maximum] (Hypothesis-found:
    # rows [-4.76837158203125e-07, -4.70197740328915e-38]).
    vals = [-4.76837158203125e-07, -4.70197740328915e-38]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("x", "Sum")] == sum(vals)
    assert m[("x", "Minimum")] <= m[("x", "Mean")] <= m[("x", "Maximum")]
    assert m[("x", "StandardDeviation")] > 0.0


def test_all_zero_column_stays_exact(spark):
    # max|x| = 0 is NOT below the floor: both branches are exact there and
    # the decimal path keeps the cross-engine determinism contract.
    df = spark.createDataFrame([(0.0,), (0.0,), (0.0,)], "x double")
    m = metrics_dict(scan_metrics_long(df).collect())
    assert m[("x", "Sum")] == 0.0
    assert m[("x", "Mean")] == 0.0
    assert m[("x", "StandardDeviation")] == 0.0


def test_approx_count_distinct_tolerance(spark, lineitem):
    # |ACD - exact| <= 3 * rsd * exact at the default rsd=0.05
    m = metrics_dict(scan_metrics_long(lineitem).collect())
    exact = lineitem.select(F.countDistinct("l_orderkey")).collect()[0][0]
    acd = m[("l_orderkey", "ApproxCountDistinct")]
    assert abs(acd - exact) <= 3 * 0.05 * exact


def test_quantile_sketch_tolerance(spark, lineitem):
    # percentile_approx with accuracy=100 ~ relative RANK error 1/100:
    # the reported quantile must sit within +-3*(1/100) of the target rank.
    import bisect

    m = metrics_dict(scan_metrics_long(lineitem).collect())
    xs = sorted(r[0] for r in lineitem.select("l_quantity").collect())
    n = len(xs)
    for i in range(1, 10):
        p = i / 10
        v = m[("l_quantity", f"ApproxQuantiles-{p!r}")]
        lo = bisect.bisect_left(xs, v) / n
        hi = bisect.bisect_right(xs, v) / n
        assert lo - 0.03 <= p <= hi + 0.03, (p, v, lo, hi)


def test_wide_table_batching(spark):
    # 150 numeric columns with batch size 64 -> 3 fused jobs, same results
    data = [(float(i),) * 150 for i in range(10)]
    cols = ", ".join(f"c{i} double" for i in range(150))
    df = spark.createDataFrame(data, cols)
    m = metrics_dict(
        scan_metrics_long(df, ProfilerConfig(max_fused_columns_per_pass=64)).collect()
    )
    assert m[("c0", "Sum")] == 45.0
    assert m[("c149", "Sum")] == 45.0
    assert m[("*", "Size")] == 10.0


def test_adversarial_column_names(spark):
    """Quotes, backticks, spaces, dots and unicode in column names must
    flow through the SQL-string expression builders unharmed (sql_ident
    escaping), for scan AND frequency metrics."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    names = ["it's", "back`tick", "with space", "dotted.name", "日本語"]
    schema = StructType(
        [StructField(names[0], LongType())]
        + [StructField(n, StringType()) for n in names[1:]]
    )
    df = spark.createDataFrame(
        [(1, "a", "b", "c", "d"), (2, "a", "y", "z", "w")], schema
    )
    m = metrics_dict(
        scan_metrics_long(df, ProfilerConfig(compute_expensive=True)).collect()
    )
    assert m[("*", "Size")] == 2.0
    assert m[(names[0], "Sum")] == 3.0
    for n in names[1:]:
        assert m[(n, "Completeness")] == 1.0
        assert m[(n, "MaxLength")] == 1.0

    from data_profiler_for_aws_glue_data_catalog_spark.operators.frequency_metrics import (
        frequency_metrics_long,
    )

    fm = metrics_dict(
        frequency_metrics_long(df, names[1], "string", ProfilerConfig()).collect()
    )
    assert fm[(names[1], "CountDistinct")] == 1.0
