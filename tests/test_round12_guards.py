"""r9 ADVICE fixes: ROUND12 saturation guard in wasserstein_1d and the
huge-finite pass-through in masking's bucket strategy.

Spark's floor(double) returns BIGINT, so any rounding term whose
scaled value exceeds Long.Max silently saturates while DuckDB's floor
stays double — these tests pin engine/oracle parity exactly on the
inputs that used to diverge (W1 value spread > 1e7; bucket input
1e300)."""

from __future__ import annotations

import duckdb
import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators.masking import (
    mask_columns,
    mask_columns_sql,
)
from data_profiler_for_aws_glue_data_catalog_spark.operators.wasserstein import (
    wasserstein_1d,
    wasserstein_1d_sql,
)


def _values_sql(vals: list[float]) -> str:
    body = ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
    return f"SELECT x FROM (VALUES {body}) t(x)"


@pytest.mark.parametrize(
    "left, right",
    [
        # spread > 1e7: single term |cdf_gap|*gap ~ 5e10 -> term*1e12
        # ~ 5e22 >> Long.Max; pre-guard Spark saturated, DuckDB didn't
        ([0.0, 1.0e11], [0.0, 0.0]),
        # mixed: one huge gap term among small (small terms still round)
        ([0.0, 1.0, 2.0, 5.0e10], [0.0, 1.0, 2.0, 3.0]),
        # everything small: guard must not perturb the rounded path
        ([0.0, 1.5, 2.25], [0.5, 1.5, 3.0]),
    ],
)
def test_w1_huge_spread_engine_oracle_parity(spark, left, right):
    a = spark.createDataFrame([(v,) for v in left], "x double")
    b = spark.createDataFrame([(v,) for v in right], "x double")
    got = wasserstein_1d(a, b, "x").collect()[0]

    con = duckdb.connect()
    sql = wasserstein_1d_sql(_values_sql(left), _values_sql(right), "x")
    want = con.sql(sql).fetchone()
    con.close()

    assert (got["n_left"], got["n_right"]) == (want[1], want[2])
    assert got["w1"] == want[3], f"engine {got['w1']} != oracle {want[3]}"


def test_w1_huge_spread_not_saturated(spark):
    """The W1 value itself must be the true area, not a Long.Max/1e12
    cap (~9.2e6): a 1e11 shift of half the mass gives W1 = 5e10."""
    a = spark.createDataFrame([(0.0,), (1.0e11,)], "x double")
    b = spark.createDataFrame([(0.0,), (0.0,)], "x double")
    w1 = wasserstein_1d(a, b, "x").collect()[0]["w1"]
    assert w1 == pytest.approx(5.0e10, rel=1e-9)
    assert w1 > 9.3e6  # pre-guard saturation ceiling


@pytest.mark.parametrize("v", [1.0e300, -1.0e300, 9.5e18, float("inf")])
def test_bucket_huge_finite_passthrough_parity(spark, v):
    df = spark.createDataFrame([(v,), (1234.5,)], "amount double")
    got = {
        r.amount
        for r in mask_columns(df, {"amount": "bucket"}, bucket_width=1000.0)
        .collect()
    }
    lit = f"CAST('{v}' AS DOUBLE)" if v == float("inf") else repr(v)
    con = duckdb.connect()
    sql = mask_columns_sql(
        f"(SELECT CAST(amount AS DOUBLE) AS amount FROM (VALUES "
        f"({lit}), (1234.5)) t(amount))",
        ["amount"],
        {"amount": "bucket"},
        bucket_width=1000.0,
    )
    want = {r[0] for r in con.sql(sql).fetchall()}
    con.close()
    assert got == want
    assert v in got  # huge value passes through unbucketed
    assert 1000.0 in got  # normal value still buckets
