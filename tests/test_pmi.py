from __future__ import annotations

import math

from data_profiler_for_aws_glue_data_catalog_spark.operators import pmi as PM


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_perfect_collocation(spark):
    # "x y" always adjacent, both words only in that pair
    docs = _docs(spark, ["x y", "x y", "a b a b"])
    got = {(r.word_x, r.word_y): r for r in PM.bigram_pmi(docs, min_count=2).collect()}
    r = got[("x", "y")]
    assert r.n_pair == 2 and r.n_x == 2 and r.n_y == 2
    # surviving pairs: (x,y)=2,(a,b)=2, (b,a)=1 dropped -> total_p=4;
    # total_w = 8 tokens
    want = math.log((2 / 4) / ((2 / 8) * (2 / 8)))
    assert abs(r.pmi - want) < 1e-5


def test_min_count_filters_rare_pairs(spark):
    docs = _docs(spark, ["p q", "r s"])
    assert PM.bigram_pmi(docs, min_count=2).count() == 0
    assert PM.bigram_pmi(docs, min_count=1).count() == 2


def test_single_word_docs_make_no_pairs(spark):
    docs = _docs(spark, ["solo", "", "alone"])
    assert PM.bigram_pmi(docs, min_count=1).count() == 0
