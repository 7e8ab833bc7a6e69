from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators.dedup import dedup_summary
from data_profiler_for_aws_glue_data_catalog_spark.operators.freshness import freshness
from data_profiler_for_aws_glue_data_catalog_spark.operators.segments import segment_deviations
from data_profiler_for_aws_glue_data_catalog_spark.operators.text_analysis import lang_confusion


def test_dedup_summary_counts(spark):
    docs = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "unique"), (3, "Same Text")],
        "doc_id bigint, text string",
    )
    r = dedup_summary(docs).collect()[0]
    # normalization folds case: 3 copies of "same text" + 1 unique
    assert (r.n_docs, r.n_distinct_contents) == (4, 2)
    assert r.n_dup_docs == 3
    assert r.n_redundant == 2
    assert r.dup_rate == 0.5


def test_freshness_window_counts(spark):
    rows = [
        (1, dt.datetime(2024, 1, 30, 12, 0, 0)),
        (2, dt.datetime(2024, 1, 25, 0, 0, 1)),
        (3, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp")
    r = freshness(df, "ts", dt.datetime(2024, 1, 31, 0, 0, 0)).collect()[0]
    assert (r.n_rows, r.n_stamped) == (4, 3)
    assert r.age_seconds == 12 * 3600
    assert r.n_last_24h == 1
    assert r.n_last_7d == 2
    assert r.max_ts.startswith("2024-01-30 12:00:00")


def test_segment_deviations_math(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "seg string, v double")
    got = {r.segment: r for r in segment_deviations(df, "seg", "v").collect()}
    assert got["a"].seg_mean == 2.0
    assert got["a"].overall_mean == pytest.approx(14 / 3, abs=1e-5)
    assert got["b"].abs_diff == pytest.approx(10 - 14 / 3, abs=1e-5)
    assert got["b"].n == 1


def test_lang_confusion_shape(spark, documents):
    rows = lang_confusion(documents.limit(200)).collect()
    assert rows, "confusion matrix should be non-empty"
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, 0.0)
        by_label[r.label] += r.frac_of_label
    assert all(abs(v - 1.0) < 1e-4 for v in by_label.values())
