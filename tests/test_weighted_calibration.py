"""weighted_sample, calibration_curve, bloom_semi_join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.bloom_join import bloom_semi_join
from data_profiler_for_aws_glue_data_catalog_spark.operators.calibration import calibration_curve
from data_profiler_for_aws_glue_data_catalog_spark.operators.weighted_sampling import weighted_sample


def test_weighted_sample_determinism_and_bias(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 100.0).otherwise(1.0).alias("w"),
    )
    s1 = {r["id"] for r in weighted_sample(df, "w", 200).collect()}
    s2 = {r["id"] for r in weighted_sample(df, "w", 200).collect()}
    assert s1 == s2 and len(s1) == 200
    heavy = sum(1 for i in s1 if i < 100)
    assert heavy >= 60  # 100x weight -> heavy ids dominate their share
    # different seed -> different (but still deterministic) sample
    s3 = {r["id"] for r in weighted_sample(df, "w", 200, seed=7).collect()}
    assert s3 != s1


def test_calibration_monotone_for_perfect_score(spark):
    df = spark.range(1000).select(
        (F.col("id") / 1000.0).alias("score"),
        (F.col("id") >= 500).cast("int").alias("y"),
    )
    rows = {r["bucket"]: r for r in
            calibration_curve(df, "score", F.col("y") == 1, 10).collect()}
    assert len(rows) == 10
    assert sum(r["n"] for r in rows.values()) == 1000
    rates = [rows[b]["pos_rate"] for b in sorted(rows)]
    assert rates == sorted(rates)  # perfectly monotone score
    assert rates[0] == 0.0 and rates[-1] == 1.0


def test_bloom_semi_join_exact_and_prefiltered(spark):
    from tests.test_plans import plan_str

    fact = spark.range(10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    keys = spark.range(100).select((F.col("id") * 7).alias("key"))
    out = bloom_semi_join(fact, keys, "k", "key")
    got = {r["k"] for r in out.collect()}
    want = {i * 7 for i in range(100) if i * 7 < 10000}
    assert got == want  # slot collisions never change the result
    p = plan_str(out)
    assert p.count("LeftSemi") >= 2  # prefilter + exact semi
    assert "BroadcastHashJoin" in p  # the slot table is broadcast
    assert "xxhash64" in p
