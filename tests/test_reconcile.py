"""reconcile_totals status classes and summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.reconcile import (
    reconcile_summary,
    reconcile_totals,
)


def test_reconcile_classes(spark):
    header = spark.createDataFrame(
        [(1, 30.0), (2, 99.0), (3, 10.0)], "k long, total double"
    )
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 50.0)], "k long, amt double"
    )
    out = {r["key"]: r for r in
           reconcile_totals(header, detail, "k", "k", "total", F.col("amt")).collect()}
    assert out[1]["status"] == "matched" and out[1]["diff"] == 0.0
    assert out[2]["status"] == "mismatched" and out[2]["diff"] == 49.0
    assert out[3]["status"] == "missing_detail"
    s = reconcile_summary(
        reconcile_totals(header, detail, "k", "k", "total", F.col("amt"))
    ).collect()[0]
    assert (s["n_keys"], s["n_matched"], s["n_mismatched"], s["n_missing_detail"]) == (3, 1, 1, 1)
    assert s["abs_diff_total"] == 49.0
