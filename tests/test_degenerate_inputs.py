"""Adversarial/degenerate-input hardening for the extension surface.

The §2.A metrics have all-null/empty/single-row unit tests; these give
the round-2 extension operators the same treatment: empty corpora,
all-null key columns, single-row/single-group frames, and texts too
short to shingle. The contract under test is graceful degradation —
empty or trivially-correct results, never an NPE/ANSI
division-by-zero/element_at crash that a 100 TB run would hit on one
weird partition.
"""

from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import dedup as D
from data_profiler_for_aws_glue_data_catalog_spark.operators import similarity as S

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"
EV_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

T0 = dt.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture(scope="module")
def null_docs(spark):
    # ids present, every text NULL
    return spark.createDataFrame(
        [(i, None, None, None, None) for i in range(4)], DOC_SCHEMA
    )


@pytest.fixture(scope="module")
def one_doc(spark):
    return spark.createDataFrame([(1, "only one document here", "en", "s", 22)], DOC_SCHEMA)


@pytest.fixture(scope="module")
def short_docs(spark):
    # texts shorter than the shingle width n=3 words
    return spark.createDataFrame(
        [(1, "hi", "en", "s", 2), (2, "yo", "en", "s", 2), (3, "", "en", "s", 0)],
        DOC_SCHEMA,
    )


@pytest.fixture(scope="module")
def empty_embs(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


@pytest.fixture(scope="module")
def one_emb(spark):
    return spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0], 0)], EMB_SCHEMA)


@pytest.fixture(scope="module")
def zero_emb(spark):
    # zero vector: norm 0 -> cosine undefined; must not divide by zero
    return spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0], 0), (2, [1.0, 0.0, 0.0, 0.0], 0)], EMB_SCHEMA
    )


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame([], EV_SCHEMA)


@pytest.fixture(scope="module")
def null_events(spark):
    return spark.createDataFrame(
        [(i, None, None, None, None, None) for i in range(3)], EV_SCHEMA
    )


# ---------------------------------------------------------------- dedup


def test_exact_duplicates_empty(empty_docs):
    assert D.exact_duplicates(empty_docs).count() == 0


def test_exact_duplicates_all_null_text(null_docs):
    # established semantics (oracle-hashed): NULL texts hash to the NULL
    # group and are duplicates of each other; one verdict row per doc
    rows = D.exact_duplicates(null_docs).collect()
    assert len(rows) == 4
    assert all(r["group_size"] == 4 for r in rows)
    assert sum(r["is_keep"] for r in rows) == 1


def test_jaccard_empty_and_single(empty_docs, one_doc):
    assert D.jaccard_near_duplicates(empty_docs).count() == 0
    assert D.jaccard_near_duplicates(one_doc).count() == 0


def test_jaccard_short_texts_no_crash(short_docs):
    # nothing shingles -> no candidates, not an exception
    assert D.jaccard_near_duplicates(short_docs).count() == 0


def test_minhash_lsh_empty_single_null(empty_docs, one_doc, null_docs):
    assert D.minhash_lsh_near_duplicates(empty_docs).count() == 0
    assert D.minhash_lsh_near_duplicates(one_doc).count() == 0
    assert D.minhash_lsh_near_duplicates(null_docs).count() == 0


def test_simhash_empty_and_short(empty_docs, short_docs):
    assert D.simhash_near_duplicates(empty_docs).count() == 0
    assert D.simhash_near_duplicates(short_docs).count() == 0


def test_embedding_near_duplicates_empty_single(empty_embs, one_emb):
    assert D.embedding_near_duplicates(empty_embs).count() == 0
    assert D.embedding_near_duplicates(one_emb).count() == 0


def test_embedding_near_duplicates_zero_vector(zero_emb):
    # zero-norm vector can never be a near-duplicate; must not divide by 0
    assert D.embedding_near_duplicates(zero_emb, n_cells=None).count() == 0


def test_dedup_eval_empty_corpus(empty_docs):
    r = D.dedup_eval(empty_docs).collect()[0]
    assert (r["n_truth"], r["n_pred"], r["tp"], r["fp"], r["fn"]) == (0, 0, 0, 0, 0)
    # 0/0 must be NULL, not a crash
    assert r["precision"] is None and r["recall"] is None


def test_dedup_summary_empty_and_null(empty_docs, null_docs):
    r = D.dedup_summary(empty_docs).collect()[0]
    assert r["n_docs"] == 0 and r["dup_rate"] is None
    # NULL texts form one content group (exact_duplicates semantics)
    r2 = D.dedup_summary(null_docs).collect()[0]
    assert r2["n_docs"] == 4 and r2["n_distinct_contents"] == 1


def test_minhash_incremental_no_new_docs(one_doc):
    from pyspark.sql import functions as F

    assert D.minhash_lsh_incremental(one_doc, F.lit(False)).count() == 0


def test_resolve_clusters_no_pairs(one_doc):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.dup_clusters import resolve_duplicates

    out = resolve_duplicates(one_doc, D.minhash_lsh_near_duplicates(one_doc))
    rows = out.collect()
    # the single doc survives as its own keeper
    assert len(rows) == 1


# ---------------------------------------------------------------- ANN


def test_cosine_topk_empty(empty_embs):
    assert S.cosine_topk(empty_embs, [1, 2]).count() == 0


def test_cosine_topk_single_vector(one_emb):
    # query = the only vector; no OTHER neighbors exist
    assert S.cosine_topk(one_emb, [1]).count() == 0


def test_cosine_topk_zero_vector_query(zero_emb):
    # zero-norm query: cosine undefined -> no pairs, no div-by-zero
    out = S.cosine_topk(zero_emb, [1])
    assert out.where("query_id = 1").count() == 0


def test_ivf_topk_tiny_corpus(one_emb):
    # corpus smaller than n_cells: centroid collect must not crash
    assert S.ivf_topk(one_emb, [1], n_cells=8).count() == 0


def test_lsh_topk_empty(empty_embs):
    assert S.lsh_topk(empty_embs, [1]).count() == 0


def test_knn_join_single_vector(one_emb):
    assert S.knn_join(one_emb, k=3).count() == 0


def test_ivf_inertia_empty(empty_embs):
    # no vectors -> empty or zero-row inertia, never a crash
    assert S.ivf_inertia(empty_embs).count() in (0, 1)


# ------------------------------------------------------- funnels & co.


def test_funnel_empty_and_null_events(empty_events, null_events):
    from data_profiler_for_aws_glue_data_catalog_spark.operators import funnel as FN

    steps = ["view", "click", "purchase"]
    assert FN.funnel(empty_events, steps).count() == 0
    # all-null frame: NULL entities are untrackable and EXCLUDED (a
    # grouped NULL would pool every anonymous event into one pseudo-entity
    # that can trivially convert — caught by the skew fuzz NULL-key
    # variant); funnel_sql filters u IS NOT NULL identically
    assert FN.funnel(null_events, steps).count() == 0
    # ungrouped agg emits one row even on empty input (the oracle's
    # n_total CTE too): one row per stage, zero entities, NULL conversion
    srows = FN.funnel_summary(empty_events, steps).collect()
    assert len(srows) == 3
    assert all(r["n_entities"] == 0 and r["conversion"] is None for r in srows)
    assert FN.funnel_step_times(empty_events, steps).count() == 0
    assert FN.funnel_step_times(null_events, steps).count() == 0


def test_funnel_summary_single_entity_partial(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators import funnel as FN

    df = spark.createDataFrame(
        [(1, T0, 7, "view", 1.0, None)], EV_SCHEMA
    )
    got = {r.stage: r for r in FN.funnel_summary(df, ["view", "click"]).collect()}
    assert got[1].n_entities == 1 and got[2].n_entities == 0
    assert got[2].conversion == 0.0


def test_retention_empty_and_single(empty_events, spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.retention import cohort_retention

    assert cohort_retention(empty_events).count() == 0
    one = spark.createDataFrame([(1, T0, 5, "view", None, None)], EV_SCHEMA)
    rows = cohort_retention(one).collect()
    assert len(rows) == 1
    assert rows[0]["day_offset"] == 0 and rows[0]["retention"] == 1.0


def test_retention_all_null_ts(null_events):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.retention import cohort_retention

    assert cohort_retention(null_events).count() == 0


def test_attribution_empty_and_no_touches(empty_events, spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.attribution import touch_attribution

    assert touch_attribution(empty_events).count() == 0
    # conversion with zero touches keeps the row with NULL credit
    conv_only = spark.createDataFrame(
        [(1, T0, 9, "purchase", 5.0, None)], EV_SCHEMA
    )
    rows = touch_attribution(conv_only).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_touches"] == 0 and r["first_touch_id"] is None


def test_attribution_all_null_users(null_events):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.attribution import touch_attribution

    assert touch_attribution(null_events).count() == 0


def test_sessionize_empty_and_single(empty_events, spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.sessions import sessionize

    assert sessionize(empty_events).count() == 0
    one = spark.createDataFrame([(1, T0, 5, "view", None, None)], EV_SCHEMA)
    assert sessionize(one).count() == 1


# ------------------------------------------------- stats on degenerates


def test_zscore_single_row_group(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.zscore import zscore_normalize

    df = spark.createDataFrame([(1, "g", 5.0)], "id bigint, g string, v double")
    r = zscore_normalize(df, "v", "g", "id").collect()[0]
    assert r["z"] is None  # degenerate group flags, not poisons


def test_zscore_constant_group(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.zscore import zscore_normalize

    df = spark.createDataFrame(
        [(i, "g", 3.0) for i in range(5)], "id bigint, g string, v double"
    )
    assert all(r["z"] is None for r in zscore_normalize(df, "v", "g", "id").collect())


def test_iqr_outliers_all_null_column(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import iqr_outliers

    df = spark.createDataFrame([(None,), (None,)], "x double")
    r = iqr_outliers(df, ["x"]).collect()[0]
    assert r["n_values"] == 0 and r["n_outliers"] == 0
    assert r["outlier_rate"] is None


def test_mad_outliers_single_value(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import mad_outliers

    df = spark.createDataFrame([(7.0,)], "x double")
    r = mad_outliers(df, ["x"]).collect()[0]
    assert r["n_values"] == 1 and r["n_outliers"] == 0


def test_winsorize_empty_frame(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import winsorize

    df = spark.createDataFrame([], "x double")
    assert winsorize(df, ["x"]).count() == 0


def test_equi_depth_constant_column(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.numeric_histogram import (
        equi_depth_histograms,
    )

    df = spark.createDataFrame([(1.0,)] * 6, "x double")
    rows = equi_depth_histograms(df, ["x"], 4).collect()
    # all bounds tie -> a single surviving bucket holding everything
    assert sum(r["cnt"] for r in rows) == 6


def test_ab_compare_empty(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.zscore import ab_compare

    df = spark.createDataFrame([], "id bigint, v double")
    assert ab_compare(df, "v", "id").count() == 0
