"""Deterministic sampling: stability under repartition, rate accuracy,
split consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_test_split,
)


def test_sample_invariant_under_partitioning(spark, documents):
    a = {r["doc_id"] for r in deterministic_sample(documents, 0.3).collect()}
    shuffled = documents.repartition(17, "lang")
    b = {r["doc_id"] for r in deterministic_sample(shuffled, 0.3).collect()}
    assert a == b
    # and stable across invocations
    c = {r["doc_id"] for r in deterministic_sample(documents, 0.3).collect()}
    assert a == c


def test_sample_rate_accuracy(spark, documents):
    n = documents.count()
    got = deterministic_sample(documents, 0.3).count()
    assert abs(got / n - 0.3) < 0.1


def test_sample_nested_rates(spark, documents):
    """A lower-rate sample with the same seed is a subset of a higher-rate
    one (threshold semantics, not independent draws)."""
    lo = {r["doc_id"] for r in deterministic_sample(documents, 0.1).collect()}
    hi = {r["doc_id"] for r in deterministic_sample(documents, 0.4).collect()}
    assert lo <= hi


def test_split_is_partition(spark, documents):
    out = train_test_split(documents, 0.2)
    n = documents.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == n
    # test side == the same-seed sample at the same rate
    test_ids = {r["doc_id"] for r in out.where(F.col("split") == "test").collect()}
    sample_ids = {r["doc_id"] for r in deterministic_sample(documents, 0.2).collect()}
    assert test_ids == sample_ids


def test_stratified_rates(spark, documents):
    out = stratified_sample(documents, {"en": 0.0, "de": 1.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs            # rate 0 drops the stratum
    n_de = documents.where(F.col("lang") == "de").count()
    assert out.where(F.col("lang") == "de").count() == n_de  # rate 1 keeps all
    # unlisted strata fall back to default_rate=0
    assert langs <= {"de"}


def test_sample_per_group_exact_k(spark, documents):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.sampling import sample_per_group

    got = sample_per_group(documents, 5, "lang", "doc_id").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    sizes = {lang: len(ids) for lang, ids in by_lang.items()}
    assert all(v == 5 for v in sizes.values())
    # deterministic: same pick every run
    again = sample_per_group(documents, 5, "lang", "doc_id").collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)


def test_sample_per_group_small_group(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.sampling import sample_per_group

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, lang string"
    )
    got = sample_per_group(df, 10, "lang", "doc_id").collect()
    assert len(got) == 3  # min(k, group size)


def test_sample_quotas_exact_mixture(spark, documents):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.sampling import sample_quotas

    got = sample_quotas(documents, {"en": 10, "de": 3}).collect()
    by_lang = {}
    for r in got:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang == {"en": 10, "de": 3}  # unlisted langs dropped


def test_negative_pairs_properties(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.sampling import negative_pairs

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    rows = negative_pairs(df, k=4).collect()
    assert len(rows) == 400  # dense ids -> every candidate verifies
    assert all(r["neg_id"] != r["anchor_id"] for r in rows)
    assert all(0 <= r["neg_id"] < 100 for r in rows)
    # deterministic: same input -> same pairs
    again = negative_pairs(df, k=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_aqp_estimate_near_truth(spark):
    from pyspark.sql import functions as F

    from data_profiler_for_aws_glue_data_catalog_spark.operators.sampling import aqp_mean_estimate

    df = spark.range(100000).select(
        F.col("id").alias("l_orderkey"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    r = aqp_mean_estimate(df, "v", rate=0.05, id_col="l_orderkey").collect()[0]
    true_mean = 499.5
    assert r["ci_low"] <= r["mean_est"] <= r["ci_high"]
    # estimate within a loose band of truth, CI not degenerate
    assert abs(r["mean_est"] - true_mean) < 50
    assert 0 < (r["ci_high"] - r["ci_low"]) < 60
    # deterministic: re-run gives identical estimates
    again = aqp_mean_estimate(df, "v", rate=0.05, id_col="l_orderkey").collect()[0]
    assert again["mean_est"] == r["mean_est"] and again["n_sample"] == r["n_sample"]
