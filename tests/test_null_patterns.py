from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import null_patterns as NP


def test_patterns_and_fractions(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), (None, None), ("b", 2)],
        "s string, n int",
    )
    got = {r.pattern: r for r in NP.null_patterns(df).collect()}
    assert got["00"].n_rows == 2
    assert got["00"].fraction == 0.5
    assert got["01"].null_columns == "n"
    assert got["11"].null_columns == "s,n"
    assert abs(sum(r.fraction for r in got.values()) - 1.0) < 1e-5


def test_column_subset(spark):
    df = spark.createDataFrame([("a", None), (None, None)], "s string, n int")
    got = {r.pattern: r.n_rows for r in NP.null_patterns(df, ["s"]).collect()}
    assert got == {"0": 1, "1": 1}


def test_no_nulls_single_pattern(spark, lineitem):
    rows = NP.null_patterns(lineitem.limit(500), ["l_orderkey", "l_returnflag"]).collect()
    assert len(rows) == 1
    assert rows[0].pattern == "00"
    assert rows[0].fraction == 1.0
