"""Spearman rank correlation matrix: average ranks -> Pearson machinery.

Monotonic-association complement to operators/correlation.py (robust to
outliers and nonlinear-but-monotone relations — the standard screen for
feature redundancy over heavy-tailed columns). Semantics: LISTWISE
complete (rows where every selected column is non-null), fractional
(average) ranks per column over that set, then the exact-decimal Pearson
of the ranks — reusing correlation_matrix verbatim, ranks being small
integers/halves that always take its decimal branch.

Plan shape: per column one groupBy(value) frequency + one cumulative
window over the DISTINCT-value relation (tiny for categorical-ish
numerics), then an equi-join back on the value — ranks never require a
global sort of the data. The final Pearson is correlation.py's single
fused scan. Scale notes (100 TB): the cum-window is single-partition
over distinct values (KS caveat, divergence.py) — for continuous
doubles pre-round/bucket first; the rank join is a shuffle equi-join
per column, AQE-coalesced.

Determinism: average rank = cum_before + (cnt+1)/2 — integer window
sums and a half-integer division, bit-exact across engines; the moment
sums inherit correlation.py's decimal contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.correlation import correlation_matrix, correlation_sql

SPEARMAN_COLS = ["col_a", "col_b", "n_pairs", "corr"]


def _ranked(df: DataFrame, columns: list[str]) -> DataFrame:
    """Complete-rows frame with each column replaced by its average rank.

    Cumulative counts come from the DISTRIBUTED prefix-sum helper
    (plans/partitioning.partitioned_prefix_sums), not a single-partition
    window — near-unique numeric columns make the distinct relation
    data-sized, and the two-phase cumsum keeps ranking parallel there.
    """
    from data_profiler_for_aws_glue_data_catalog_spark.plans.partitioning import partitioned_prefix_sums

    base = df.na.drop(subset=list(columns)).select(*columns)
    out = base
    for c in columns:
        freq = base.groupBy(F.col(c).alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
        cum = partitioned_prefix_sums(freq, "_v", ["_c"])
        ranks = cum.select(
            "_v",
            (
                (F.col("cum__c") - F.col("_c")).cast("double")
                + (F.col("_c") + 1).cast("double") / F.lit(2.0)
            ).alias(f"_rank_{c}"),
        )
        out = out.join(ranks, out[c] == ranks["_v"]).drop("_v")
    return out.select(
        *[F.col(f"_rank_{c}").alias(c) for c in columns]
    )


def spearman_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """Upper-triangle Spearman correlations: (col_a, col_b, n_pairs, corr)."""
    return correlation_matrix(_ranked(df, columns), columns)


def spearman_sql(table: str, columns: list[str]) -> str:
    """DuckDB mirror: identical average-rank definition (min-rank +
    (ties-1)/2 == cum_before + (cnt+1)/2) feeding correlation_sql."""
    complete = " AND ".join(f"{c} IS NOT NULL" for c in columns)
    rank_cols = ", ".join(
        f"CAST(rank() OVER (ORDER BY {c}) AS DOUBLE)"
        f" + (COUNT(*) OVER (PARTITION BY {c}) - 1) / 2.0 AS {c}"
        for c in columns
    )
    ranked = (
        f"(SELECT {rank_cols} FROM "
        f"(SELECT {', '.join(columns)} FROM {table} WHERE {complete}) _cmpl)"
    )
    return correlation_sql(ranked, columns)
