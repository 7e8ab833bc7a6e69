"""k-anonymity / l-diversity audit over quasi-identifier columns.

The privacy-risk companion to operators/masking.py: BEFORE releasing a
dataset, measure how identifying the quasi-identifier (QI) combination
is — a row in a QI group of size < k is re-identifiable (k-anonymity,
Sweeney 2002, public); a group whose sensitive column shows < l
distinct values leaks the attribute even at size >= k (l-diversity).
The audit's output tells you which masking.py strategy to escalate
(bucket wider, drop a QI, null the sensitive column).

Plan shape: ONE groupBy over the QI tuple computing group size +
distinct sensitive values (two aggregates, one shuffle), then a 1-row
summary. Group count is bounded by the QI domain product — the same
relation a release would publish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANON_COLS = [
    "n_rows", "n_groups", "min_group_size",
    "n_unsafe_groups", "n_unsafe_rows",
    "n_lowdiv_groups", "n_lowdiv_rows",
]


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """One-row audit: groups/rows below the k-anonymity threshold and
    below the l-diversity threshold for ``sensitive_col``.

    NULL QI values form their own group (SQL GROUP BY semantics — a NULL
    zip code still buckets people).
    """
    g = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(F.col(sensitive_col)).alias("_l"),
    )
    return g.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_n").alias("min_group_size"),
        F.sum((F.col("_n") < k).cast("int")).alias("n_unsafe_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias(
            "n_unsafe_rows"
        ),
        F.sum((F.col("_l") < l).cast("int")).alias("n_lowdiv_groups"),
        F.sum(F.when(F.col("_l") < l, F.col("_n")).otherwise(0)).alias(
            "n_lowdiv_rows"
        ),
    ).select(*ANON_COLS)


def k_anonymity_sql(
    table: str,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> str:
    """DuckDB mirror of :func:`k_anonymity`."""
    qi = ", ".join(qi_cols)
    return f"""
WITH g AS (
  SELECT COUNT(*) AS _n, COUNT(DISTINCT {sensitive_col}) AS _l
  FROM {table} GROUP BY {qi}
)
SELECT SUM(_n) AS n_rows, COUNT(*) AS n_groups,
  MIN(_n) AS min_group_size,
  SUM(CASE WHEN _n < {k} THEN 1 ELSE 0 END) AS n_unsafe_groups,
  SUM(CASE WHEN _n < {k} THEN _n ELSE 0 END) AS n_unsafe_rows,
  SUM(CASE WHEN _l < {l} THEN 1 ELSE 0 END) AS n_lowdiv_groups,
  SUM(CASE WHEN _l < {l} THEN _n ELSE 0 END) AS n_lowdiv_rows
FROM g
"""
