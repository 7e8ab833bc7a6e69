from __future__ import annotations

import math

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import compliance as CP
from data_profiler_for_aws_glue_data_catalog_spark.operators import mutual_info as MI


def _by_key(rows):
    return {(r.entity, r.instance, r.name): r.value for r in rows}


def test_compliance_fraction_and_null_predicate(spark):
    # NULL predicate rows count as non-compliant (Deequ CASE WHEN shape).
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 20.0)], "id int, v double"
    )
    m = CP.compliance_metrics(
        df, rules=[CP.ComplianceRule("v_pos", "v > 0")]
    ).collect()
    got = _by_key(m)
    assert got[("Dataset", "v_pos", "Compliance")] == pytest.approx(2 / 4)


def test_pattern_match_over_nonnull_rows(spark):
    df = spark.createDataFrame(
        [("a1",), ("bb",), (None,), ("c3",)], "s string"
    )
    m = CP.compliance_metrics(
        df, patterns=[CP.PatternRule("has_digit", "s", "[0-9]")]
    ).collect()
    got = _by_key(m)
    # 2 of 3 non-null values contain a digit; null row excluded from both sides
    assert got[("Column", "s", "PatternMatch.has_digit")] == pytest.approx(2 / 3)
    assert m[0].type == "string"


def test_compliance_empty_table_is_null(spark):
    df = spark.createDataFrame([], "v double, s string")
    m = CP.compliance_metrics(
        df,
        rules=[CP.ComplianceRule("r", "v > 0")],
        patterns=[CP.PatternRule("p", "s", "x")],
    ).collect()
    assert all(r.value is None for r in m)


def test_compliance_single_fused_pass(spark, lineitem):
    """All rules ride ONE aggregation job: exactly one scan in the plan."""
    rules = [CP.ComplianceRule(f"r{i}", f"l_quantity > {i}") for i in range(20)]
    pats = [CP.PatternRule(f"p{i}", "l_returnflag", c) for i, c in enumerate("RAN")]
    m = CP.compliance_metrics(lineitem, rules, pats)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_mutual_information_independent_and_dependent(spark):
    # y == x -> MI = H(x); z constant -> MI = 0
    rows = [(i % 3, i % 3, 0) for i in range(300)]
    df = spark.createDataFrame(rows, "x int, y int, z int")
    m = {
        (r.col_a, r.col_b): r.mutual_information
        for r in MI.mutual_information(df, [("x", "y"), ("x", "z")]).collect()
    }
    assert m[("x", "y")] == pytest.approx(math.log(3), abs=1e-6)
    assert m[("x", "z")] == pytest.approx(0.0, abs=1e-9)


def test_mutual_information_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (None, 1), (1, None)], "a int, b int"
    )
    r = MI.mutual_information(df, [("a", "b")]).collect()[0]
    assert r.n_joint == 2
    assert r.mutual_information == pytest.approx(math.log(2), abs=1e-6)


def test_mutual_information_empty_is_null(spark):
    df = spark.createDataFrame([], "a int, b int")
    r = MI.mutual_information(df, [("a", "b")]).collect()[0]
    assert r.n_joint == 0
    assert r.mutual_information is None


def test_mi_nonnegative_and_bounded_by_entropy(spark, lineitem):
    """Property: 0 <= MI(a,b) <= min(H(a), H(b)) (up to rounding)."""
    import pyspark.sql.functions as F

    r = MI.mutual_information(
        lineitem, [("l_returnflag", "l_linestatus")]
    ).collect()[0]
    ents = []
    for c in ("l_returnflag", "l_linestatus"):
        freq = lineitem.where(F.col(c).isNotNull()).groupBy(c).count()
        total = freq.selectExpr("sum(count) AS n").collect()[0].n
        h = freq.selectExpr(
            f"-sum((count / cast({total} AS double)) * "
            f"ln(count / cast({total} AS double))) AS h"
        ).collect()[0].h
        ents.append(h)
    assert -1e-9 <= r.mutual_information <= min(ents) + 1e-6


def test_violation_samples_lowest_ids(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id bigint, v double"
    )
    got = CP.violation_samples(
        df, [CP.ComplianceRule("v_big", "v > 7")], "id", k=3
    ).collect()
    assert sorted((r.rule, r.id) for r in got) == [
        ("v_big", 1), ("v_big", 2), ("v_big", 3)
    ]


def test_violation_samples_null_predicate_fails(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id bigint, v double")
    got = CP.violation_samples(
        df, [CP.ComplianceRule("v_pos", "v > 0")], "id"
    ).collect()
    assert [(r.rule, r.id) for r in got] == [("v_pos", 1)]


def test_violation_samples_clean_rule_empty(spark):
    df = spark.createDataFrame([(1, 5.0)], "id bigint, v double")
    got = CP.violation_samples(
        df,
        [CP.ComplianceRule("ok", "v > 0"), CP.ComplianceRule("bad", "v > 9")],
        "id",
    ).collect()
    assert [(r.rule, r.id) for r in got] == [("bad", 1)]
