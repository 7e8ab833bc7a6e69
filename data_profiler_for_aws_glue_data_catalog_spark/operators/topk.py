"""Generic deterministic top-k per group.

The ubiquitous "k best rows per key" — top sellers per region, longest
documents per language, highest-value events per type. One window
shuffle keyed by the group, rank via ``row_number`` over a TOTAL order
(value direction + id tie-break), so the survivors are deterministic
under ties — the same discipline as sample_per_group/trending.

Scale notes (100 TB): Spark's window top-k pushes a per-partition
rank limit before the shuffle when k is small (WindowGroupLimit in
Spark 3.5+/4), so each map task forwards at most k rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """The k top rows per group by ``order_col`` (ties broken by
    ``tie_col`` ascending — required for determinism when values repeat)."""
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def topk_per_group_sql(
    table: str,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str | None = None,
    descending: bool = True,
    select_cols: list[str] | None = None,
) -> str:
    """DuckDB mirror (same total order)."""
    direction = "DESC" if descending else "ASC"
    tie = f", {tie_col} ASC" if tie_col else ""
    cols = ", ".join(select_cols) if select_cols else "* EXCLUDE (__rk)"
    return f"""
SELECT {cols} FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {group_col} ORDER BY {order_col} {direction}{tie}
  ) AS __rk
  FROM {table}
) WHERE __rk <= {k}
"""
