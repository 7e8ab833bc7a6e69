from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import fd as FD


def _rows(spark, data):
    return spark.createDataFrame(data, "det string, a string, b string")


def _by_dep(df):
    return {r.dependent: r for r in df.collect()}


def test_exact_fd(spark):
    df = _rows(spark, [("x", "1", "p"), ("x", "1", "q"), ("y", "2", "p")])
    got = _by_dep(FD.fd_strength(df, "det", ["a", "b"]))
    assert got["a"].group_strength == 1.0
    assert got["a"].row_strength == 1.0
    # det=x has two distinct b values -> not determined
    assert got["b"].n_determined_groups == 1
    assert got["b"].group_strength == 0.5
    assert got["b"].n_determined_rows == 1
    assert abs(got["b"].row_strength - 1 / 3) < 1e-6


def test_all_null_dep_group_is_determined(spark):
    df = _rows(spark, [("x", None, "p"), ("x", None, "p"), ("y", "1", "q")])
    got = _by_dep(FD.fd_strength(df, "det", ["a"]))
    assert got["a"].n_determined_groups == 2
    assert got["a"].group_strength == 1.0


def test_key_determines_everything(spark, lineitem):
    # (l_orderkey, l_linenumber) is the PK, so l_orderkey alone determines
    # order-level columns exactly.
    got = _by_dep(FD.fd_strength(lineitem.limit(2000), "l_orderkey", ["l_orderkey"]))
    assert got["l_orderkey"].group_strength == 1.0
