"""1-D Wasserstein (earth-mover) distance between two samples.

The integral complement of the KS statistic (divergence.py): KS reports
the worst POINT of CDF disagreement, W1 reports the total AREA between
the CDFs — `W1 = sum over adjacent distinct values of
|F_left - F_right| * (v_next - v)` — so it sees magnitude of drift, not
just existence (a 1% quantile shift across the whole range moves W1 but
barely moves KS). Standard metric for numeric-feature drift gates.

Plan shape: identical to ks_statistic — two frequency aggregations, a
full-outer value join, cumulative sums via the ADAPTIVE distributed
prefix-sum helper (plans/partitioning.py), then one ordered-window lead
for the gap to the next distinct value. Scale caveat matches KS:
the distinct-value relation drives the cum/lead windows; pre-bucket
continuous doubles when the domain is data-sized.

Determinism: CDF fractions are int/int double divisions; each area term
is ROUND12'd then DECIMAL-accumulated (order-free), the total ROUND6'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND6 = (  # 6-dp deterministic rounding; specials/huge pass through
    "CASE WHEN abs({x}) < 9.0e12 "
    "THEN floor(({x}) * 1000000.0 + 0.5) / 1000000.0 ELSE ({x}) END"
)
ROUND12 = "floor(({x}) * 1000000000000.0 + 0.5) / 1000000000000.0"

W1_COLS = ["column", "n_left", "n_right", "w1"]


def wasserstein_1d(left: DataFrame, right: DataFrame, col: str) -> DataFrame:
    """Single-row W1 distance between the two frames' distributions of a
    numeric column (NULLs excluded)."""
    from data_profiler_for_aws_glue_data_catalog_spark.plans.partitioning import (
        materialize,
        partitioned_prefix_sums,
    )

    # W1 is defined over finite observations: NaN/±Inf (and |v| >= 1e12,
    # where a single CDF-gap term would leave the decimal(27,12) domain)
    # are excluded like NULLs on both sides — distance-to-infinite-mass
    # is infinite by definition, and the engines' specials arithmetic
    # diverges (Spark floor saturation vs DuckDB propagation, decimal
    # cast error vs NULL). r8 float-specials axis find.
    dom = f"coalesce(abs(cast(`{col}` AS double)) < 1e12, false)"
    lf = (
        left.where(F.col(col).isNotNull() & F.expr(dom))
        .select(F.col(col).cast("double").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cl"))
    )
    rf = (
        right.where(F.col(col).isNotNull() & F.expr(dom))
        .select(F.col(col).cast("double").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    f = lf.join(rf, on="v", how="full_outer").select(
        "v",
        F.coalesce(F.col("cl"), F.lit(0)).alias("cl"),
        F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
    )
    # f feeds three consumers (adaptive count, cumsums, totals):
    # materialize once so the two scans + aggs + join run exactly once.
    f = materialize(f)
    cum = partitioned_prefix_sums(f, "v", ["cl", "cr"], pinned=True)
    tot = f.agg(F.sum("cl").alias("nl"), F.sum("cr").alias("nr"))
    # gap to the next distinct value; the last value contributes no area
    wlead = Window.orderBy("v")
    terms = (
        cum.select(
            "v",
            "cum_cl",
            "cum_cr",
            (F.lead("v").over(wlead) - F.col("v")).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
        .crossJoin(F.broadcast(tot))
    )
    term_x = (
        "abs(CAST(cum_cl AS DOUBLE) / nl - CAST(cum_cr AS DOUBLE) / nr) * gap"
    )
    terms = terms.selectExpr(
        "nl",
        "nr",
        f"cast({ROUND12.format(x=term_x)} AS double) AS term",
    )
    return terms.agg(
        F.lit(col).alias("column"),
        F.max("nl").alias("n_left"),
        F.max("nr").alias("n_right"),
        F.expr(
            "cast(" + ROUND6.format(
                x="cast(sum(cast(term AS decimal(27,12))) AS double)"
            ) + " AS double)"
        ).alias("w1"),
    )


def wasserstein_1d_sql(left_sql: str, right_sql: str, col: str) -> str:
    """DuckDB mirror of :func:`wasserstein_1d` (same windows, rounding)."""
    r6, r12 = ROUND6.format, ROUND12.format
    term = r12(
        x="ABS(CAST(cum_cl AS DOUBLE) / nl - CAST(cum_cr AS DOUBLE) / nr) * gap"
    )
    return f"""
WITH lf AS (
  SELECT CAST({col} AS DOUBLE) AS v, COUNT(*) AS cl
  FROM ({left_sql}) WHERE {col} IS NOT NULL
    AND COALESCE(ABS(CAST({col} AS DOUBLE)) < 1e12, FALSE) GROUP BY 1
),
rf AS (
  SELECT CAST({col} AS DOUBLE) AS v, COUNT(*) AS cr
  FROM ({right_sql}) WHERE {col} IS NOT NULL
    AND COALESCE(ABS(CAST({col} AS DOUBLE)) < 1e12, FALSE) GROUP BY 1
),
f AS (
  SELECT v, COALESCE(cl, 0) AS cl, COALESCE(cr, 0) AS cr
  FROM lf FULL OUTER JOIN rf USING (v)
),
cum AS (
  SELECT v,
    SUM(cl) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_cl,
    SUM(cr) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_cr,
    LEAD(v) OVER (ORDER BY v) - v AS gap
  FROM f
),
tot AS (SELECT SUM(cl) AS nl, SUM(cr) AS nr FROM f),
terms AS (
  SELECT nl, nr, CAST({term} AS DOUBLE) AS term
  FROM cum CROSS JOIN tot WHERE gap IS NOT NULL
)
SELECT '{col}' AS "column", MAX(nl) AS n_left, MAX(nr) AS n_right,
  CAST({r6(x='CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE)')} AS DOUBLE)
    AS w1
FROM terms
"""
