"""Inter-arrival time profile: the event-cadence distribution.

How regularly do events arrive per entity? The distribution of
consecutive-event gaps drives session-gap thresholds (sessions.py),
watermark sizing (streaming/) and staleness SLOs (freshness.py) —
this operator measures it instead of guessing:
(n_gaps, mean_gap_s, min_gap_s, max_gap_s, p50_gap_s, p90_gap_s,
 p99_gap_s) over per-entity consecutive gaps in seconds.

Plan shape: ONE window shuffle keyed by entity (lag over
(ts, id)-ordered events — deterministic under timestamp ties), then a
single fused aggregate over the gap column (exact percentiles ride the
same pass; DECIMAL-accumulated mean).

Scale notes (100 TB): the entity window is the only data-sized
shuffle — identical cost to sessionization, which shares its shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

INTERARRIVAL_COLS = [
    "n_gaps", "mean_gap_s", "min_gap_s", "max_gap_s",
    "p50_gap_s", "p90_gap_s", "p99_gap_s",
]


def interarrival_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Single-row gap distribution (gaps in integer seconds, floored)."""
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gaps = (
        df.where(F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            (
                F.unix_timestamp(F.col(ts_col))
                - F.lag(F.unix_timestamp(F.col(ts_col))).over(w)
            ).alias("gap")
        )
        .where(F.col("gap").isNotNull())
    )
    mean = (
        "cast(cast(sum(cast(gap AS decimal(27,6))) AS double)"
        " / count(gap) AS double)"
    )
    return gaps.selectExpr(
        "count(gap) AS n_gaps",
        f"cast({ROUND6.format(x=mean)} AS double) AS mean_gap_s",
        "min(gap) AS min_gap_s",
        "max(gap) AS max_gap_s",
        f"cast({ROUND6.format(x='percentile(gap, 0.5)')} AS double) AS p50_gap_s",
        f"cast({ROUND6.format(x='percentile(gap, 0.9)')} AS double) AS p90_gap_s",
        f"cast({ROUND6.format(x='percentile(gap, 0.99)')} AS double) AS p99_gap_s",
    ).select(*INTERARRIVAL_COLS)


def interarrival_stats_sql(
    table: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror (same lag ordering; epoch-floored integer seconds)."""
    epoch = f"CAST(date_diff('second', TIMESTAMP '1970-01-01', {ts_col}) AS BIGINT)"
    mean = (
        "CAST(CAST(SUM(CAST(gap AS DECIMAL(27,6))) AS DOUBLE)"
        " / COUNT(gap) AS DOUBLE)"
    )
    return f"""
WITH gaps AS (
  SELECT {epoch} - LAG({epoch}) OVER (
      PARTITION BY {entity_col} ORDER BY {ts_col} ASC, {id_col} ASC
    ) AS gap
  FROM {table}
  WHERE {entity_col} IS NOT NULL AND {ts_col} IS NOT NULL
)
SELECT COUNT(gap) AS n_gaps,
  CAST({ROUND6.format(x=mean)} AS DOUBLE) AS mean_gap_s,
  MIN(gap) AS min_gap_s,
  MAX(gap) AS max_gap_s,
  CAST({ROUND6.format(x='quantile_cont(gap, 0.5)')} AS DOUBLE) AS p50_gap_s,
  CAST({ROUND6.format(x='quantile_cont(gap, 0.9)')} AS DOUBLE) AS p90_gap_s,
  CAST({ROUND6.format(x='quantile_cont(gap, 0.99)')} AS DOUBLE) AS p99_gap_s
FROM gaps WHERE gap IS NOT NULL
"""
