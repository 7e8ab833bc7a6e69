from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators.assoc_rules import association_rules
from data_profiler_for_aws_glue_data_catalog_spark.operators.blanks import blank_stats
from data_profiler_for_aws_glue_data_catalog_spark.operators.impute import impute
from data_profiler_for_aws_glue_data_catalog_spark.operators.transitions import top_paths


def test_association_rules_confidence_lift(spark):
    # a and b always together (2 groups); c alone in 1 of 3 groups
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "g bigint, item string")
    got = {(r.antecedent, r.consequent): r for r in association_rules(df, "g", "item").collect()}
    r = got[("a", "b")]
    assert r.confidence == 1.0
    assert r.lift == pytest.approx(3 / 2, abs=1e-6)  # 2*3/(2*2)
    assert ("a", "c") not in got  # below min_support


def test_impute_strategies(spark):
    df = spark.createDataFrame(
        [(1.0, "x"), (3.0, "x"), (None, None), (None, "y")],
        "v double, s string",
    )
    got = impute(df, {"v": "mean", "s": "mode"}).collect()
    vs = sorted(r.v for r in got)
    assert vs == [1.0, 2.0, 2.0, 3.0]
    ss = [r.s for r in got]
    assert ss.count("x") == 3  # mode fill


def test_impute_median_and_const(spark):
    df = spark.createDataFrame([(1.0, None), (100.0, "k"), (None, None)], "v double, s string")
    got = impute(df, {"v": "median", "s": "const:unknown"}).collect()
    assert sorted(r.v for r in got) == [1.0, 50.5, 100.0]
    assert [r.s for r in got].count("unknown") == 2


def test_top_paths(spark):
    import datetime as dt

    rows = []
    for u in (1, 2):
        for i, s in enumerate(["a", "b", "c", "a", "b", "c"]):
            rows.append((u * 100 + i, dt.datetime(2024, 1, 1, 0, i), u, s))
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {r.path: r.n_occurrences for r in top_paths(ev, length=3).collect()}
    assert got["a>b>c"] == 4
    assert got["b>c>a"] == 2


def test_blank_stats(spark):
    df = spark.createDataFrame(
        [("x",), ("",), ("   ",), (" y",), (None,)], "s string"
    )
    r = blank_stats(df, ["s"]).collect()[0]
    assert (r.n_rows, r.n_null, r.n_blank, r.n_padded) == (5, 1, 2, 2)
    assert r.effective_completeness == 0.4  # 'x' and ' y'


def test_rank_normalize(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.rank_normalize import rank_normalize

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 5.0)]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    got = {r.id: r.v_pct for r in rank_normalize(df, "g", "v", "id").collect()}
    assert got[1] == 0.0 and got[3] == 1.0
    assert got[2] == 0.5
    assert got[4] == 0.0  # singleton group: rank 0 of 0 -> 0
