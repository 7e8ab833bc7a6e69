from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import type_inference as TI


def _by_col(df):
    return {r.instance: r for r in df.collect()}


def test_class_counts_and_verdicts(spark):
    rows = [
        ("true", "1", "1.5", "abc", None),
        ("FALSE", "-42", "2", "1", "x"),
        (None, "7", "-0.25", "true", None),
    ]
    df = spark.createDataFrame(rows, "b string, i string, f string, s string, u string")
    got = _by_col(TI.infer_types(df, ["b", "i", "f", "s", "u"]))
    assert got["b"].inferred_type == "Boolean"
    assert got["b"].n_boolean == 2 and got["b"].n_nonnull == 2
    assert got["i"].inferred_type == "Integral"
    # f: mixes integral '2' with fractionals -> Fractional
    assert got["f"].inferred_type == "Fractional"
    assert got["f"].n_integral == 1 and got["f"].n_fractional == 2
    # s: mixes string/integral/boolean -> String
    assert got["s"].inferred_type == "String"
    # u: only one non-null plain string
    assert got["u"].inferred_type == "String"


def test_all_null_is_unknown(spark):
    df = spark.createDataFrame([(None,), (None,)], "c string")
    assert _by_col(TI.infer_types(df, ["c"]))["c"].inferred_type == "Unknown"


def test_numeric_columns_viewed_as_strings(spark):
    df = spark.createDataFrame([(1, 2.5), (2, 3.0)], "i bigint, d double")
    got = _by_col(TI.infer_types(df, ["i", "d"]))
    assert got["i"].inferred_type == "Integral"
    assert got["d"].inferred_type == "Fractional"


def test_string_counts_partition_nonnull(spark):
    df = spark.createDataFrame(
        [("true",), ("5",), ("5.5",), ("w",), (None,)], "c string"
    )
    r = _by_col(TI.infer_types(df, ["c"]))["c"]
    assert (r.n_boolean, r.n_integral, r.n_fractional, r.n_string) == (1, 1, 1, 1)
    assert r.n_nonnull == 4 and r.n_rows == 5


def test_single_fused_pass(spark, lineitem):
    plan = (
        TI.infer_types(lineitem, ["l_returnflag", "l_linestatus", "l_quantity"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_align_union_schema_evolution(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.types import align_union

    v1 = spark.createDataFrame([(1, "a")], "id int, name string")
    v2 = spark.createDataFrame([(2, 3.5, "x")], "id int, score double, name string")
    v3 = spark.createDataFrame([("7", None)], "id string, score double")
    out = align_union([v1, v2, v3])
    assert out.columns == ["id", "name", "score"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] is None and rows[1]["name"] == "a"
    assert rows[2]["score"] == 3.5
    assert rows[7]["id"] == 7  # string "7" cast to first-seen int type
    assert out.count() == 3
