from __future__ import annotations

import hashlib

from data_profiler_for_aws_glue_data_catalog_spark.operators.masking import mask_columns


def test_masking_strategies(spark):
    df = spark.createDataFrame(
        [("alice", "secret123", 1234.5, "2024-03-15")],
        "name string, token string, amount double, d string",
    ).selectExpr("name", "token", "amount", "cast(d AS date) AS d")
    got = mask_columns(
        df,
        {"name": "hash", "token": "prefix", "amount": "bucket", "d": "year"},
        seed=7,
        prefix_keep=3,
        bucket_width=1000.0,
    ).collect()[0]
    assert got.name == hashlib.md5(b"7|alice").hexdigest()
    assert got.token == "sec******"
    assert got.amount == 1000.0
    assert str(got.d) == "2024-01-01"


def test_null_strategy_and_passthrough(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "id bigint, s string")
    rows = mask_columns(df, {"s": "null"}).collect()
    assert all(r.s is None for r in rows)
    assert [r.id for r in rows] != [None, None]  # id passes through


def test_nulls_stay_null(spark):
    df = spark.createDataFrame([(None,)], "v string")
    for strat in ("hash", "prefix"):
        assert mask_columns(df, {"v": strat}).collect()[0].v is None


def test_hash_pseudonym_is_join_stable(spark):
    a = spark.createDataFrame([("u1",), ("u2",)], "u string")
    b = spark.createDataFrame([("u1",)], "u string")
    ma = mask_columns(a, {"u": "hash"}, seed=3)
    mb = mask_columns(b, {"u": "hash"}, seed=3)
    assert ma.join(mb, "u").count() == 1
