from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import table_diff as TD


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "id bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)],
        "id bigint, s string, v double",
    )
    return old, new


def test_statuses(spark):
    old, new = _frames(spark)
    got = {r.id: r.status for r in TD.table_diff(old, new, ["id"]).collect()}
    assert got == {
        1: "removed",
        2: "changed",  # v 20 -> 25
        3: "unchanged",  # NULL == NULL under IS DISTINCT FROM
        4: "added",
    }


def test_compare_subset_of_columns(spark):
    old, new = _frames(spark)
    got = {
        r.id: r.status
        for r in TD.table_diff(old, new, ["id"], compare_cols=["s"]).collect()
    }
    assert got[2] == "unchanged"  # v differs but s compared only


def test_summary_zero_filled(spark):
    old, new = _frames(spark)
    got = {r.status: r.n for r in TD.diff_summary(old, new, ["id"]).collect()}
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}
    empty = spark.createDataFrame([], "id bigint, s string, v double")
    got2 = {r.status: r.n for r in TD.diff_summary(empty, empty, ["id"]).collect()}
    assert got2 == {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}


def test_composite_keys(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], "a bigint, b string, v double")
    new = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "a bigint, b string, v double"
    )
    got = {
        (r.a, r.b): r.status
        for r in TD.table_diff(old, new, ["a", "b"]).collect()
    }
    assert got == {(1, "x"): "unchanged", (1, "y"): "added"}


def test_schema_diff_classes(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.table_diff import schema_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, v double")
    new = spark.createDataFrame([(1, "a", "x")], "k int, v string, w string")
    out = {r["column"]: r["change"] for r in schema_diff(old, new).collect()}
    assert out == {
        "k": "unchanged", "s": "removed", "v": "type_changed", "w": "added"
    }
