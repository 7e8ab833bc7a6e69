from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.salted_join import SALT_COL, salted_join


def _frames(spark):
    fact = spark.createDataFrame(
        [(i, 1 if i < 80 else i % 5, float(i)) for i in range(100)],
        "row_id bigint, k bigint, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(5)], "k2 bigint, name string"
    )
    return fact, dim


def test_matches_plain_join(spark):
    fact, dim = _frames(spark)
    got = salted_join(fact, dim, "k", "k2", "row_id", n_salts=4).collect()
    want = fact.join(dim, fact["k"] == dim["k2"]).collect()
    key = lambda r: (r.row_id, r.k2)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert SALT_COL not in salted_join(fact, dim, "k", "k2", "row_id").columns


def test_hot_keys_only_replication(spark):
    fact, dim = _frames(spark)
    got = salted_join(
        fact, dim, "k", "k2", "row_id", n_salts=4, hot_keys=[1]
    ).collect()
    want = fact.join(dim, fact["k"] == dim["k2"]).collect()
    assert len(got) == len(want)


def test_fact_salt_spreads_hot_key(spark):
    fact, _ = _frames(spark)
    from data_profiler_for_aws_glue_data_catalog_spark.operators.salted_join import _fact_salt

    salts = (
        fact.where(F.col("k") == 1)
        .select(_fact_salt(F.col("row_id"), 4).alias("s"))
        .distinct()
        .count()
    )
    assert salts == 4  # the hot key's rows land on every salt


def test_left_join_preserves_unmatched(spark):
    fact, dim = _frames(spark)
    dim_small = dim.where(F.col("k2") < 2)
    got = salted_join(fact, dim_small, "k", "k2", "row_id", how="left")
    assert got.count() == 100
    assert got.where(F.col("name").isNull()).count() == fact.join(
        dim_small, fact["k"] == dim_small["k2"], "left"
    ).where(F.col("name").isNull()).count()
