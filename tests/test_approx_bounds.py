"""Sketch bounds-verdict operator (operators/approx_bounds.py) + the
file-balance verdict projection — the r8 upgrade that turned the two
rows-only queries into hash-gated ones."""

from __future__ import annotations

import math

import duckdb
import pytest

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators.approx_bounds import (
    APPROX_BOUNDS_COLS,
    approx_bounds_verdict,
)
from data_profiler_for_aws_glue_data_catalog_spark.operators.file_balance import (
    file_balance,
    file_balance_verdict,
)
from data_profiler_for_aws_glue_data_catalog_spark.sources.registry import load_tables


def test_all_verdicts_true_on_testdata(spark):
    li = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    rows = approx_bounds_verdict(li, ProfilerConfig()).collect()
    assert rows and all(r["within_bounds"] is True for r in rows)
    assert [f.name for f in approx_bounds_verdict(li).schema.fields] == (
        APPROX_BOUNDS_COLS
    )


def test_inventory_matches_oracle(spark):
    """The (instance, name) inventory must equal the oracle's — driven by
    the same schema classification on both sides."""
    from data_profiler_for_aws_glue_data_catalog_spark.oracle import approx_bounds_sql

    li = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    got = {
        (r["instance"], r["name"])
        for r in approx_bounds_verdict(li).collect()
    }
    con = duckdb.connect()
    want = {(r[1], r[2]) for r in con.sql(approx_bounds_sql("lineitem")).fetchall()}
    con.close()
    assert got == want


def test_all_null_and_nan_columns_pass(spark):
    """Empty-domain branch (all-NULL) and NaN-as-NULL policy both yield
    TRUE verdicts instead of NULL-propagating to false."""
    rows = [(i, None, float("nan") if i % 3 == 0 else float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, dead double, x double")
    out = {
        (r["instance"], r["name"]): r["within_bounds"]
        for r in approx_bounds_verdict(df).collect()
    }
    assert out and all(v is True for v in out.values())
    assert ("dead", "ApproxQuantiles-0.5") in out


def test_violated_bound_reports_false(spark):
    """Sanity: the verdict is falsifiable — shrink the quantile window to
    (numerically) zero rank slack on a high-cardinality column and at
    least one quantile verdict must flip false (sketch accuracy 100 has
    real rank error at n >> accuracy)."""
    import data_profiler_for_aws_glue_data_catalog_spark.operators.approx_bounds as AB

    df = spark.range(200_000).selectExpr(
        "cast(id AS double) + 0.25 * pmod(id, 7) AS x"
    )
    old_slack, old_small = AB._RANK_SLACK, AB._SMALL_N
    try:
        AB._RANK_SLACK, AB._SMALL_N = 1e-9, 1
        rows = approx_bounds_verdict(df).collect()
    finally:
        AB._RANK_SLACK, AB._SMALL_N = old_slack, old_small
    quant = [r for r in rows if r["name"].startswith("ApproxQuantiles")]
    assert any(r["within_bounds"] is False for r in quant)


def test_file_balance_verdict(spark, tmp_path):
    out = str(tmp_path / "t")
    spark.range(1000).repartition(4).write.parquet(out)
    df = spark.read.parquet(out)
    r = file_balance_verdict(df).collect()[0]
    assert r["n_rows"] == 1000 and r["layout_consistent"] is True
    # consistency with the raw diagnostic
    raw = file_balance(df).collect()[0]
    assert raw["n_rows"] == 1000 and raw["n_files"] == 4
    assert math.isclose(raw["balance_ratio"], raw["max_rows"] / raw["mean_rows"],
                        rel_tol=1e-6)


def test_file_balance_verdict_empty(spark, tmp_path):
    out = str(tmp_path / "e")
    spark.range(10).where("id < 0").write.parquet(out)
    r = file_balance_verdict(spark.read.parquet(out)).collect()[0]
    assert r["n_rows"] == 0 and r["layout_consistent"] is True


@pytest.mark.parametrize("n", [0, 1, 50])
def test_small_inputs_always_pass(spark, n):
    df = spark.range(n).selectExpr("cast(id AS double) AS x",
                                   "cast(id AS string) AS s")
    rows = approx_bounds_verdict(df).collect()
    assert all(r["within_bounds"] is True for r in rows)
