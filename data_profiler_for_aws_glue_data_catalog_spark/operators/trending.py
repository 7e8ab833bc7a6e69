"""Trending keys: top-k by count per tumbling time window.

"What trended each day" — the windowed companion to skew.hot_keys.
One ``groupBy(window, key)`` count (the only data shuffle; map-side
combine collapses hot keys), then a rank window over the grouped
relation — |windows x keys| rows, not data rows. Deterministic
tie-break: count DESC, key-string ASC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TRENDING_COLS = ["window_start", "key_value", "cnt", "rank"]


def trending_keys(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 day",
    k: int = 5,
) -> DataFrame:
    """(window_start string, key_value string, cnt, rank) per window."""
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col(key_col).cast("string").alias("key_value"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rk = Window.partitionBy("w").orderBy(
        F.desc("cnt"), F.asc_nulls_first("key_value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= k)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "key_value",
            "cnt",
            "rank",
        )
        .select(*TRENDING_COLS)
    )


def trending_keys_sql(
    table: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    k: int = 5,
) -> str:
    """DuckDB mirror with 1-day tumbling windows (day truncation)."""
    return f"""
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, key_value, cnt, rank
FROM (
  SELECT ws, key_value, cnt,
    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY cnt DESC, key_value ASC NULLS FIRST) AS rank
  FROM (
    SELECT date_trunc('day', {ts_col}) AS ws,
      CAST({key_col} AS VARCHAR) AS key_value, count(*) AS cnt
    FROM {table} WHERE {ts_col} IS NOT NULL
    GROUP BY ws, key_value
  )
)
WHERE rank <= {k}
"""
