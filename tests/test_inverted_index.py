from __future__ import annotations

import datetime as dt

from data_profiler_for_aws_glue_data_catalog_spark.operators import inverted_index as II
from data_profiler_for_aws_glue_data_catalog_spark.streaming.windowed_profile import windowed_distinct


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_postings_sorted_and_distinct(spark):
    docs = _docs(spark, ["b a b", "a c", "a"])
    got = {r.term: r for r in II.inverted_index(docs, min_df=1).collect()}
    assert list(got["a"].postings) == [0, 1, 2]
    assert got["a"].doc_freq == 3
    # duplicate occurrences within a doc count once
    assert list(got["b"].postings) == [0]


def test_df_pruning(spark):
    docs = _docs(spark, ["x y", "x z", "x w"])
    got = {r.term for r in II.inverted_index(docs, min_df=2).collect()}
    assert got == {"x"}
    got_capped = {
        r.term for r in II.inverted_index(docs, min_df=1, max_df=2).collect()
    }
    assert "x" not in got_capped  # df=3 > max_df
    assert {"y", "z", "w"} <= got_capped


def test_windowed_distinct_counts(spark):
    rows = [
        (1, dt.datetime(2026, 1, 1, 10, 5), 7),
        (2, dt.datetime(2026, 1, 1, 10, 55), 7),
        (3, dt.datetime(2026, 1, 1, 10, 30), 8),
        (4, dt.datetime(2026, 1, 1, 11, 1), 7),
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint")
    got = {
        r.window_start.hour: (r.n_events, r.n_distinct)
        for r in windowed_distinct(ev).collect()
    }
    assert got[10] == (3, 2)
    assert got[11] == (1, 1)
