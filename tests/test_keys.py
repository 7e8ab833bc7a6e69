from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import keys as K


@pytest.fixture()
def table(spark):
    # id unique; grp repeats; (grp, sub) unique except one dup; nullable col
    rows = [
        (1, "a", 1, "x"),
        (2, "a", 2, "y"),
        (3, "b", 1, None),
        (4, "b", 1, "z"),  # (grp,sub) duplicate of row 3
    ]
    return spark.createDataFrame(rows, "id bigint, grp string, sub int, v string")


def _by_key(df):
    return {r.key_cols: r for r in df.collect()}


def test_single_column_key(spark, table):
    got = _by_key(K.candidate_keys(table, [["id"], ["grp"]]))
    assert got["id"].is_key is True
    assert got["id"].uniqueness == 1.0
    assert got["grp"].is_key is False
    assert got["grp"].n_distinct == 2
    assert got["grp"].uniqueness == pytest.approx(0.5)


def test_composite_key_with_duplicate(spark, table):
    r = _by_key(K.candidate_keys(table, [["grp", "sub"]]))["grp,sub"]
    assert r.n_complete == 4
    assert r.n_distinct == 3  # (b,1) appears twice
    assert r.is_key is False


def test_null_columns_break_key(spark, table):
    # v is unique among non-null rows but has a null -> not a key
    r = _by_key(K.candidate_keys(table, [["v"]]))["v"]
    assert r.n_complete == 3
    assert r.n_distinct == 3
    assert r.uniqueness == 1.0
    assert r.is_key is False  # a null row can never satisfy a key


def test_empty_table(spark):
    df = spark.createDataFrame([], "a int, b int")
    r = _by_key(K.candidate_keys(df, [["a", "b"]]))["a,b"]
    assert r.n_rows == 0 and r.n_distinct == 0
    assert r.uniqueness is None
    assert r.is_key is True  # vacuously: no rows violate


def test_all_candidates_one_job(spark, lineitem):
    """Every candidate set fuses into one aggregation: single scan."""
    plan = (
        K.candidate_keys(
            lineitem,
            [["l_orderkey", "l_linenumber"], ["l_orderkey"], ["l_partkey"]],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_composite_uniqueness_metrics(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.keys import composite_uniqueness

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, None)], "k bigint, s string"
    )
    got = {r.key_cols: r for r in composite_uniqueness(df, [["k"], ["k", "s"]]).collect()}
    r = got["k"]
    assert (r.n_rows_nonnull, r.n_combinations, r.n_unique_combinations) == (4, 3, 2)
    assert r.distinctness == 0.75
    assert r.uniqueness == 0.5
    ks = got["k,s"]  # the (3, None) row drops
    assert (ks.n_rows_nonnull, ks.n_combinations) == (3, 2)
