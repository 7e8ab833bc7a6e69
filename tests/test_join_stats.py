from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import join_stats as JS


def test_estimate_matches_actual_join(spark):
    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k bigint"
    )
    b = spark.createDataFrame(
        [(1,), (2,), (2,), (4,), (None,)], "k bigint"
    )
    r = JS.join_size_estimate(a, b, "k").collect()[0]
    actual = a.join(b, "k").count()  # nulls never equi-match
    assert r.est_join_rows == actual == 4  # 2*1 + 1*2
    assert r.keys_common == 2
    assert r.n_left == 4 and r.n_right == 4  # non-null rows
    assert r.join_shape == "many_to_many"


def test_one_to_many_classification(spark):
    a = spark.createDataFrame([(1,), (2,)], "k bigint")  # unique
    b = spark.createDataFrame([(1,), (1,), (2,)], "k bigint")
    r = JS.join_size_estimate(a, b, "k").collect()[0]
    assert r.join_shape == "one_to_many"
    assert r.est_join_rows == 3


def test_disjoint_keys(spark):
    a = spark.createDataFrame([(1,)], "k bigint")
    b = spark.createDataFrame([(2,)], "k bigint")
    r = JS.join_size_estimate(a, b, "k").collect()[0]
    assert r.est_join_rows == 0
    assert r.keys_common == 0
    assert r.join_shape == "one_to_one"  # no common multiplicity > 1


def test_pk_fk_shape_on_tpch(spark, lineitem):
    orders_like = lineitem.select("l_orderkey").distinct()
    r = JS.join_size_estimate(
        orders_like, lineitem, "l_orderkey", "l_orderkey"
    ).collect()[0]
    assert r.join_shape == "one_to_many"
    assert r.est_join_rows == lineitem.count()
