"""Constraint verification/suggestion unit tests (operators/constraints.py)."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark import ProfilerConfig, profile_table
from data_profiler_for_aws_glue_data_catalog_spark.operators import constraints as C


def _statuses(df):
    return {r["constraint_name"]: r["status"] for r in df.collect()}


def test_verify_statuses(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, -5.0), (4, "b", 15.0)],
        "id int, s string, v double",
    )
    suite = [
        C.has_size("==", 4.0),
        C.is_complete("id"),
        C.is_complete("s"),            # 3/4 -> Failure
        C.is_unique("id"),
        C.is_unique("s"),              # 'b' repeats -> Failure
        C.is_non_negative("v"),        # -5 -> Failure
        C.has_min("v", ">=", -5.0),
        C.has_max("v", "<", 20.0),     # 20 -> Failure
        C.has_mean("v", "==", 10.0),
        C.has_sum("v", "==", 40.0),
        C.has_pattern("s", "^[ab]$"),
        C.satisfies("v > 0", "v_pos", ">=", 0.75),
    ]
    got = _statuses(C.verify(df, suite))
    assert got == {
        "has_size(*)": "Success",
        "is_complete(id)": "Success",
        "is_complete(s)": "Failure",
        "is_unique(id)": "Success",
        "is_unique(s)": "Failure",
        "is_non_negative(v)": "Failure",
        "has_min(v)": "Success",
        "has_max(v)": "Failure",
        "has_mean(v)": "Success",
        "has_sum(v)": "Success",
        "has_pattern(s)": "Success",
        "satisfies(v_pos)": "Success",
    }


def test_verify_null_metric_fails(spark):
    """All-null and empty inputs produce NULL metrics -> Failure, no error."""
    df = spark.createDataFrame([(None,), (None,)], "v double")
    suite = [C.has_mean("v", ">=", 0.0), C.has_min("v", ">=", 0.0)]
    assert set(_statuses(C.verify(df, suite)).values()) == {"Failure"}

    empty = df.where("v IS NOT NULL")
    assert set(_statuses(C.verify(empty, suite)).values()) == {"Failure"}


def test_verify_one_job(spark):
    """The whole suite compiles to a single fused aggregate (one scan)."""
    df = spark.range(100).selectExpr("id", "cast(id AS double) AS v")
    plan = C.verify(
        df, [C.has_size(">", 0.0), C.has_mean("v", ">", 0.0), C.has_min("v", ">=", 0.0)]
    )._jdf.queryExecution().executedPlan().toString()
    # one partial/final HashAggregate pair over one single-row exchange
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_suggest_constraints(spark):
    df = spark.createDataFrame(
        [(1, "abc", 5.0), (2, "de", -1.0), (3, None, 2.0)],
        "id int, s string, v double",
    )
    m = profile_table(df, ProfilerConfig(), include_approx=False)
    got = {(r["instance"], r["rule"]): r["threshold"]
           for r in C.suggest_constraints(m).collect()}
    assert got[("id", "is_complete")] == 1.0
    assert got[("id", "is_unique")] == 1.0
    assert got[("id", "is_non_negative")] == 1.0
    assert ("v", "is_non_negative") not in got          # min is -1
    assert abs(got[("s", "has_completeness_geq")] - 2 / 3) < 1e-6
    assert got[("s", "has_max_length_leq")] == 3.0
    assert ("id", "has_completeness_geq") not in got    # fully complete
