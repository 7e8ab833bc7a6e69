from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import contamination as CT


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_verbatim_doc_fully_contained(spark):
    corpus = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    r = CT.contamination(corpus, bench).collect()[0]
    assert r.containment == 1.0
    assert r.is_contaminated


def test_disjoint_doc_zero_containment(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    bench = _docs(spark, [(100, "one two three four five six")])
    r = CT.contamination(corpus, bench).collect()[0]
    assert r.containment == 0.0 and r.n_hit == 0
    assert not r.is_contaminated


def test_partial_overlap_fraction(spark):
    # bench doc: 5 tokens -> 3 trigram shingles; first trigram shared
    corpus = _docs(spark, [(1, "aa bb cc xx yy zz")])
    bench = _docs(spark, [(100, "aa bb cc dd ee")])
    r = CT.contamination(corpus, bench).collect()[0]
    assert r.n_shingles == 3
    assert r.n_hit == 1
    assert r.containment == pytest.approx(1 / 3, abs=1e-6)


def test_threshold_flag(spark):
    corpus = _docs(spark, [(1, "aa bb cc dd ee")])
    bench = _docs(spark, [(100, "aa bb cc dd ff")])  # 2 of 3 shingles hit
    low = CT.contamination(corpus, bench, threshold=0.5).collect()[0]
    high = CT.contamination(corpus, bench, threshold=0.9).collect()[0]
    assert low.is_contaminated and not high.is_contaminated


def test_short_bench_docs_excluded(spark):
    # fewer tokens than n -> no shingles -> no row (dedup convention)
    corpus = _docs(spark, [(1, "aa bb cc dd")])
    bench = _docs(spark, [(100, "aa bb")])
    assert CT.contamination(corpus, bench).count() == 0
