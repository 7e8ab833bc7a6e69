"""Data freshness metrics for timestamped tables.

The ops question every pipeline dashboard answers first: "when did this
table last receive data, and how much lately?" Single fused aggregate:
(n_rows, n_stamped, min_ts, max_ts, age_seconds, n_last_24h, n_last_7d)
relative to an explicit ``as_of`` instant (passed in, never now() —
determinism and backfill-testability; the reference's run-timestamp
columns in the Parquet sink serve the same role, Main.scala:234-242).

Plan shape: ONE fused scan aggregate, zero shuffles. Conditional
recency counts are count_if streams in the same pass.

Scale notes (100 TB): on partitioned-by-date layouts, pair with a
partition-pruned pre-filter for the recency windows; the unpruned form
here is the general fallback.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRESHNESS_COLS = [
    "n_rows", "n_stamped", "min_ts", "max_ts", "age_seconds",
    "n_last_24h", "n_last_7d",
]


def _fmt(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%d %H:%M:%S")


def freshness(df: DataFrame, ts_col: str, as_of: datetime) -> DataFrame:
    """Single-row freshness profile relative to ``as_of`` (UTC)."""
    asof = f"timestamp'{_fmt(as_of)}'"
    c = f"`{ts_col}`" if not ts_col.startswith("`") else ts_col
    return df.selectExpr(
        "count(1) AS n_rows",
        f"count({c}) AS n_stamped",
        f"cast(min({c}) AS string) AS min_ts",
        f"cast(max({c}) AS string) AS max_ts",
        f"cast(unix_timestamp({asof}) - unix_timestamp(max({c})) AS bigint)"
        " AS age_seconds",
        f"sum(CASE WHEN {c} >= {asof} - INTERVAL 24 HOUR AND {c} <= {asof}"
        " THEN 1 ELSE 0 END) AS n_last_24h",
        f"sum(CASE WHEN {c} >= {asof} - INTERVAL 7 DAY AND {c} <= {asof}"
        " THEN 1 ELSE 0 END) AS n_last_7d",
    ).select(*FRESHNESS_COLS)


def freshness_sql(table: str, ts_col: str, as_of: datetime) -> str:
    """DuckDB mirror. age via date_diff('second', ...): counting second
    boundaries up to an integral-second ``as_of`` equals Spark's floored
    unix_timestamp difference (epoch() would keep fractional seconds and
    round differently)."""
    asof = f"TIMESTAMP '{_fmt(as_of)}'"
    return f"""
SELECT COUNT(1) AS n_rows,
  COUNT({ts_col}) AS n_stamped,
  CAST(MIN({ts_col}) AS VARCHAR) AS min_ts,
  CAST(MAX({ts_col}) AS VARCHAR) AS max_ts,
  CAST(date_diff('second', MAX({ts_col}), {asof}) AS BIGINT) AS age_seconds,
  SUM(CASE WHEN {ts_col} >= {asof} - INTERVAL 24 HOUR AND {ts_col} <= {asof}
      THEN 1 ELSE 0 END) AS n_last_24h,
  SUM(CASE WHEN {ts_col} >= {asof} - INTERVAL 7 DAY AND {ts_col} <= {asof}
      THEN 1 ELSE 0 END) AS n_last_7d
FROM {table}
"""
