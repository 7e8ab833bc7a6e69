from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import ref_integrity as RI


def _pair(spark, fact_rows, dim_rows):
    fact = spark.createDataFrame([(k,) for k in fact_rows], "fk bigint")
    dim = spark.createDataFrame([(k,) for k in dim_rows], "pk bigint")
    return RI.referential_integrity(fact, "fk", dim, "pk", "fact", "dim").collect()[0]


def test_full_containment(spark):
    r = _pair(spark, [1, 1, 2, 3], [1, 2, 3, 4])
    assert (r.n_rows, r.n_null_fk, r.n_matched_rows, r.n_orphan_rows) == (4, 0, 4, 0)
    assert (r.n_distinct_fk, r.n_orphan_values) == (3, 0)
    assert r.containment_rows == 1.0
    assert r.containment_values == 1.0


def test_orphans_and_nulls(spark):
    # 2 rows of key 9 are orphans; one NULL fk is excluded from the ratio.
    r = _pair(spark, [1, 9, 9, None], [1, 2])
    assert (r.n_rows, r.n_null_fk) == (4, 1)
    assert (r.n_matched_rows, r.n_orphan_rows) == (1, 2)
    assert (r.n_distinct_fk, r.n_orphan_values) == (2, 1)
    assert r.containment_rows == pytest.approx(1 / 3, abs=1e-6)
    assert r.containment_values == 0.5


def test_report_unions_pairs(spark):
    fact = spark.createDataFrame([(1,), (2,)], "fk bigint")
    dim = spark.createDataFrame([(1,), (2,)], "pk bigint")
    rep = RI.referential_integrity_report(
        spark,
        [
            (fact, "fk", dim, "pk", "f", "d"),
            (fact, "fk", dim, "pk", "f2", "d"),
        ],
    )
    rows = {r.fk_table: r for r in rep.collect()}
    assert set(rows) == {"f", "f2"}
    assert all(r.containment_rows == 1.0 for r in rows.values())


def test_tpch_lineitem_orders(spark, lineitem):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    r = RI.referential_integrity(
        lineitem, "l_orderkey", orders, "o_orderkey", "lineitem", "orders"
    ).collect()[0]
    # TPC-H guarantees every lineitem resolves to an order.
    assert r.containment_rows == 1.0
    assert r.n_orphan_values == 0
