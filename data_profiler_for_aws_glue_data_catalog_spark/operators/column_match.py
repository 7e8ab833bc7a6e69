"""Duplicate/renamed-column discovery via value-set fingerprints.

Schema-matching primitive: two columns (possibly in different tables)
that hold the SAME value set are duplicate/renamed candidates. Each
column collapses to a k-min-hash fingerprint of its distinct value
set — k smallest seeded hashes — and columns with equal fingerprints
are near-certain matches (equal sets => equal fingerprints; unequal
sets collide with probability ~ (|A∩B|/|A∪B|)^k).

Plan shape (per table): ONE fused aggregate computes every column's
fingerprint in one scan — min(md5(seed||value)) per (column, seed)
are plain min aggregates, no shuffle beyond the 1-row reduce. The
candidate join then matches fingerprint STRINGS (32 bytes x k), never
values: cross-table column matching at 100 TB costs one scan per
table + a join over #columns rows.

Verification is inclusion_stats' job (exact containment on the
candidate pairs) — same candidates-then-verify discipline as LSH.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FINGERPRINT_COLS = ["table_name", "column_name", "fingerprint", "n_seeds"]
MATCH_COLS = [
    "table_a", "column_a", "table_b", "column_b", "fingerprint",
]

_SEEDS = (11, 23, 37, 53)


def column_fingerprints(
    df: DataFrame, table_name: str, columns: list[str] | None = None
) -> DataFrame:
    """One row per column: k-min-hash fingerprint of the distinct value
    set (values compare as strings; NULLs excluded)."""
    cols = list(columns or df.columns)
    aggs = []
    for c in cols:
        mins = [
            f"min(md5(concat('{s}|', cast(`{c}` AS string))))" for s in _SEEDS
        ]
        aggs.append(f"concat_ws(',', {', '.join(mins)}) AS fp_{cols.index(c)}")
    row = df.selectExpr(*aggs)
    stack = ", ".join(f"'{c}', fp_{i}" for i, c in enumerate(cols))
    return row.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column_name, fingerprint)"
    ).selectExpr(
        f"'{table_name}' AS table_name",
        "column_name",
        "fingerprint",
        f"{len(_SEEDS)} AS n_seeds",
    ).select(*FINGERPRINT_COLS)


def duplicate_columns(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    columns: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Candidate duplicate/renamed column pairs across ``tables``:
    equal-fingerprint pairs, ordered (table_a, column_a) < (table_b,
    column_b) to dedup orientation."""
    frames = [
        column_fingerprints(df, name, (columns or {}).get(name))
        for name, df in sorted(tables.items())
    ]
    fps = reduce(DataFrame.unionByName, frames)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (
                F.concat_ws(".", F.col("a.table_name"), F.col("a.column_name"))
                < F.concat_ws(".", F.col("b.table_name"), F.col("b.column_name"))
            ),
        )
        .select(
            F.col("a.table_name").alias("table_a"),
            F.col("a.column_name").alias("column_a"),
            F.col("b.table_name").alias("table_b"),
            F.col("b.column_name").alias("column_b"),
            F.col("a.fingerprint").alias("fingerprint"),
        )
        .select(*MATCH_COLS)
    )


def duplicate_columns_sql(tables: dict[str, list[str]]) -> str:
    """DuckDB mirror of duplicate_columns over named tables/columns."""
    arms = []
    for t, cols in sorted(tables.items()):
        for c in cols:
            mins = ", ".join(
                f"min(md5('{s}|' || CAST({c} AS VARCHAR)))" for s in _SEEDS
            )
            arms.append(
                f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
                f"concat_ws(',', {mins}) AS fingerprint, "
                f"{len(_SEEDS)} AS n_seeds FROM {t}"
            )
    fps = "\nUNION ALL\n".join(arms)
    return f"""
WITH fps AS (
{fps}
)
SELECT a.table_name AS table_a, a.column_name AS column_a,
  b.table_name AS table_b, b.column_name AS column_b, a.fingerprint
FROM fps a JOIN fps b
  ON a.fingerprint = b.fingerprint
 AND a.table_name || '.' || a.column_name < b.table_name || '.' || b.column_name
"""
