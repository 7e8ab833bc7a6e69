"""Composed corpus-cleaning pipeline: semantics and plan shape."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators.corpus import clean_corpus

from tests.test_plans import plan_str


def _docs(spark):
    en = "the cat sat on the mat and the dog is in the house for a while with food"
    return spark.createDataFrame(
        [
            (1, en * 3),                       # good en doc
            (2, en * 3),                       # exact dup of 1 (normalized)
            (3, "der hund und die katze sind auf dem dach mit den anderen " * 5),  # de
            (4, "1 2 3 4 5 6 7 8 9 0 " * 10), # all digits -> low quality
            (5, en.upper() * 3),               # dup of 1 after normalization
        ],
        "doc_id bigint, text string",
    )


def test_clean_corpus_filters_and_dedups(spark):
    kept = {r["id"]: r for r in clean_corpus(_docs(spark)).collect()}
    # doc 1 survives; 2 and 5 are its normalized duplicates; 3 is German;
    # 4 is numeric noise below the quality bar
    assert set(kept) == {1}
    assert kept[1]["lang_pred"] == "en"
    assert kept[1]["quality"] >= 0.5


def test_clean_corpus_single_shuffle(spark):
    p = plan_str(clean_corpus(_docs(spark)), "simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_curriculum_bands_balanced_and_deterministic(documents):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.corpus import curriculum_assign

    out = curriculum_assign(documents, n_bands=5)
    rows = out.collect()
    n = len(rows)
    per_band = {}
    for r in rows:
        per_band.setdefault(r["band"], []).append(r)
    assert set(per_band) <= set(range(5))
    # equal-population up to quality ties
    sizes = [len(v) for v in per_band.values()]
    assert max(sizes) - min(sizes) <= max(5, n // 5)
    again = {r["doc_id"]: r["shuffle_key"] for r in curriculum_assign(documents, n_bands=5).collect()}
    assert all(again[r["doc_id"]] == r["shuffle_key"] for r in rows)
