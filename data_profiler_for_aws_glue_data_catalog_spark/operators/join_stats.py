"""Join-size estimation: predict |A JOIN B| before running the join.

At 100 TB the expensive mistake is launching a join that explodes: a
many-to-many key multiplies rows. The exact inner-equi-join output size
is sum over matching keys of cntA(k) * cntB(k) — computable from the
two frequency tables, which are tiny relative to the data (one
aggregation each, then a join of |distinct keys| rows). This operator
reports that, plus the structural diagnosis: max per-key multiplicity
on each side, the key overlap, and the join-type classification
(one_to_one / one_to_many / many_to_one / many_to_many).

Plan shape: one groupBy per side + one equi-join of the frequency
relations + a single-row aggregate — strictly cheaper than the join it
predicts, by the ratio of data rows to distinct keys.

Everything is exact integer arithmetic — trivially deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_STATS_COLS = [
    "n_left", "n_right", "keys_left", "keys_right", "keys_common",
    "est_join_rows", "max_left_mult", "max_right_mult", "join_shape",
]


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
) -> DataFrame:
    """One-row relation predicting the inner equi-join on the keys.

    ``est_join_rows`` is EXACT for the inner join (sum of per-key count
    products over non-null matching keys). ``join_shape`` classifies by
    whether either side has a key with multiplicity > 1 among common
    keys."""
    right_key = right_key or left_key
    fa = (
        left.where(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    fb = (
        right.where(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    joined = fa.join(fb, "k", "full_outer")
    both = F.col("ca").isNotNull() & F.col("cb").isNotNull()
    row = joined.agg(
        F.sum("ca").alias("n_left"),
        F.sum("cb").alias("n_right"),
        F.count(F.col("ca")).alias("keys_left"),
        F.count(F.col("cb")).alias("keys_right"),
        F.count(F.when(both, True)).alias("keys_common"),
        F.coalesce(
            F.sum(F.when(both, F.col("ca") * F.col("cb"))), F.lit(0)
        ).alias("est_join_rows"),
        F.coalesce(F.max(F.when(both, F.col("ca"))), F.lit(0)).alias(
            "max_left_mult"
        ),
        F.coalesce(F.max(F.when(both, F.col("cb"))), F.lit(0)).alias(
            "max_right_mult"
        ),
    )
    shape = (
        "CASE WHEN max_left_mult <= 1 AND max_right_mult <= 1 THEN 'one_to_one' "
        "WHEN max_left_mult <= 1 THEN 'one_to_many' "
        "WHEN max_right_mult <= 1 THEN 'many_to_one' "
        "ELSE 'many_to_many' END"
    )
    return row.selectExpr(
        "coalesce(n_left, 0) AS n_left",
        "coalesce(n_right, 0) AS n_right",
        "keys_left",
        "keys_right",
        "keys_common",
        "est_join_rows",
        "max_left_mult",
        "max_right_mult",
        f"{shape} AS join_shape",
    ).select(*JOIN_STATS_COLS)


def join_size_estimate_sql(
    left_sql: str,
    right_sql: str,
    left_key: str,
    right_key: str | None = None,
) -> str:
    """DuckDB mirror."""
    right_key = right_key or left_key
    shape = (
        "CASE WHEN max_left_mult <= 1 AND max_right_mult <= 1 THEN 'one_to_one' "
        "WHEN max_left_mult <= 1 THEN 'one_to_many' "
        "WHEN max_right_mult <= 1 THEN 'many_to_one' "
        "ELSE 'many_to_many' END"
    )
    return f"""
WITH fa AS (
  SELECT {left_key} AS k, count(*) AS ca FROM ({left_sql})
  WHERE {left_key} IS NOT NULL GROUP BY {left_key}
),
fb AS (
  SELECT {right_key} AS k, count(*) AS cb FROM ({right_sql})
  WHERE {right_key} IS NOT NULL GROUP BY {right_key}
),
j AS (SELECT fa.ca, fb.cb FROM fa FULL OUTER JOIN fb ON fa.k = fb.k),
a AS (
  SELECT COALESCE(SUM(ca), 0) AS n_left, COALESCE(SUM(cb), 0) AS n_right,
    COUNT(ca) AS keys_left, COUNT(cb) AS keys_right,
    COUNT(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN 1 END) AS keys_common,
    COALESCE(SUM(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN ca * cb END), 0) AS est_join_rows,
    COALESCE(MAX(CASE WHEN cb IS NOT NULL THEN ca END), 0) AS max_left_mult,
    COALESCE(MAX(CASE WHEN ca IS NOT NULL THEN cb END), 0) AS max_right_mult
  FROM j
)
SELECT n_left, n_right, keys_left, keys_right, keys_common, est_join_rows,
  max_left_mult, max_right_mult, {shape} AS join_shape
FROM a
"""
