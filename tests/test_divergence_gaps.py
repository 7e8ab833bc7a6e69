from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.divergence import js_divergence
from data_profiler_for_aws_glue_data_catalog_spark.operators.file_balance import file_balance
from data_profiler_for_aws_glue_data_catalog_spark.operators.gaps import missing_days


def _cat(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "c string")


def test_jsd_identical_is_zero(spark):
    l = _cat(spark, ["a", "a", "b"])
    r = _cat(spark, ["a", "a", "b", "a", "a", "b"])  # same distribution
    jsd = js_divergence(l, r, "c").collect()[0].jsd
    assert jsd == pytest.approx(0.0, abs=1e-6)


def test_jsd_disjoint_is_ln2(spark):
    l, r = _cat(spark, ["a", "b"]), _cat(spark, ["c", "d"])
    row = js_divergence(l, r, "c").collect()[0]
    assert row.jsd == pytest.approx(math.log(2), abs=1e-5)
    assert row.n_categories == 4


def test_jsd_symmetry(spark):
    l, r = _cat(spark, ["a", "a", "b"]), _cat(spark, ["a", "b", "b", "b"])
    j1 = js_divergence(l, r, "c").collect()[0].jsd
    j2 = js_divergence(r, l, "c").collect()[0].jsd
    assert j1 == pytest.approx(j2, abs=1e-6)
    assert 0 < j1 < math.log(2)


def test_missing_days(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 5),), (dt.datetime(2024, 1, 2, 5),),
        (dt.datetime(2024, 1, 5, 5),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [r.missing_day for r in missing_days(df).collect()]
    assert got == ["2024-01-03", "2024-01-04"]


def test_missing_days_dense_range_empty(spark, lineitem):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, d),) for d in range(1, 6)], "ts timestamp"
    )
    assert missing_days(df).count() == 0


def test_file_balance(spark, tmp_path):
    out = str(tmp_path / "fb")
    spark.createDataFrame(
        [(i,) for i in range(100)], "x bigint"
    ).repartition(4).write.parquet(out)
    r = file_balance(spark.read.parquet(out)).collect()[0]
    assert r.n_files == 4
    assert r.n_rows == 100
    assert r.min_rows >= 1
    assert r.balance_ratio >= 1.0


def test_ks_statistic_identical_and_disjoint(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.divergence import ks_statistic

    a = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    same = ks_statistic(a, a, "x").collect()[0]
    assert same["ks"] == 0.0
    b = spark.range(100).select((F.col("id") % 10 + 100).cast("double").alias("x"))
    disj = ks_statistic(a, b, "x").collect()[0]
    assert disj["ks"] == 1.0
    assert disj["n_left"] == 100 and disj["n_right"] == 100
