from __future__ import annotations

import math

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import bm25 as BM


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_rare_term_outranks_common(spark):
    docs = _docs(spark, ["apple banana", "apple apple", "apple cherry", "banana"])
    got = BM.bm25_topk(docs, ["cherry"], k=2).collect()
    assert got[0].doc_id == 2
    assert len(got) == 1  # only one doc contains cherry


def test_score_formula_single_term(spark):
    # one doc "w", query "w": tf=1, dl=1, avgdl=1, df=1, N=1
    docs = _docs(spark, ["w"])
    r = BM.bm25_topk(docs, ["w"], k=1).collect()[0]
    idf = math.log((1 - 1 + 0.5) / (1 + 0.5) + 1)
    want = idf * 1 * (1.2 + 1) / (1 + 1.2 * (1 - 0.75 + 0.75 * 1 / 1))
    assert r.score == pytest.approx(want, abs=1e-5)
    assert r.n_terms_hit == 1


def test_multi_term_sums_and_tie_break(spark):
    docs = _docs(spark, ["a b", "a b", "c"])
    got = BM.bm25_topk(docs, ["a", "b"], k=3).collect()
    assert [r.doc_id for r in got] == [0, 1]  # equal scores -> id order
    assert got[0].score == got[1].score
    assert got[0].n_terms_hit == 2


def test_k_limits_results(spark, documents):
    got = BM.bm25_topk(documents, ["scan", "join"], k=5).collect()
    assert len(got) == 5
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
