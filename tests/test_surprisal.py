from __future__ import annotations

import math

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators.surprisal import unigram_surprisal


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_rare_words_score_higher(spark):
    docs = _docs(spark, ["the the the the", "zyzzyva"])
    got = {r.doc_id: r.surprisal for r in unigram_surprisal(docs).collect()}
    assert got[1] > got[0]


def test_surprisal_formula(spark):
    # corpus: "a a b" -> N=3, V=2; p(a)=(2+1)/5, p(b)=(1+1)/5
    docs = _docs(spark, ["a a b"])
    r = unigram_surprisal(docs).collect()[0]
    want = -(2 * math.log(3 / 5) + math.log(2 / 5)) / 3
    assert r.surprisal == pytest.approx(want, abs=1e-4)
    assert r.n_tokens == 3


def test_empty_doc_absent(spark):
    docs = _docs(spark, ["hello world", ""])
    assert {r.doc_id for r in unigram_surprisal(docs).collect()} == {0}
