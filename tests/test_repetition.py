from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import repetition as RP


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_repetition_stats(spark):
    got = {
        r.doc_id: r
        for r in RP.word_repetition(
            _docs(spark, ["a a a b", "x y z", ""])
        ).collect()
    }
    assert got[0].n_words == 4
    assert got[0].n_distinct_words == 2
    assert got[0].repetition_ratio == 0.5
    assert got[0].top_word_share == 0.75
    assert got[1].repetition_ratio == 0.0
    assert got[1].top_word_share == 0.333333  # ROUND6(1/3)
    assert 2 not in got  # empty doc yields no tokens -> no row


def test_multiple_spaces_ignored(spark):
    got = RP.word_repetition(_docs(spark, ["a  a   b"])).collect()[0]
    assert got.n_words == 3
    assert got.n_distinct_words == 2
