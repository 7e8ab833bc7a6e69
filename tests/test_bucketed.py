from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.sinks import bucketed as B


def plan_str(df, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, mode)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    """orders + lineitem co-bucketed on the order key."""
    sfx = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix="dq_bucketed_")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    ot, lt = f"b_orders_{sfx}", f"b_lineitem_{sfx}"
    B.write_bucketed(orders, ot, f"{root}/{ot}", ["o_orderkey"], 4)
    B.write_bucketed(lineitem, lt, f"{root}/{lt}", ["l_orderkey"], 4)
    yield ot, lt
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
    spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    ot, lt = bucketed_pair
    with_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(ot)
            .join(
                spark.table(lt),
                spark.table(ot)["o_orderkey"] == spark.table(lt)["l_orderkey"],
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan_str(joined, "simple")
        assert "SortMergeJoin" in p
        # the join itself is exchange-free: the only exchange in the whole
        # plan is the post-join groupBy repartition
        assert p.count("Exchange hashpartitioning") == 1
        assert "BroadcastExchange" not in p
    finally:
        with_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "10485760")


def with_conf(spark, k, v):
    spark.conf.set(k, v)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    ot, lt = bucketed_pair
    got = (
        B.cobucketed_join(
            spark, ot, lt,
            on=spark.table(ot)["o_orderkey"] == spark.table(lt)["l_orderkey"],
        )
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    want = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert sorted((r.o_orderstatus, r["count"]) for r in got) == sorted(
        (r.o_orderstatus, r["count"]) for r in want
    )


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    ot, _ = bucketed_pair
    agg = spark.table(ot).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    p = plan_str(agg, "simple")
    assert "Exchange" not in p
