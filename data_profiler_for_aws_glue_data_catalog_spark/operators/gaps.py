"""Calendar-gap detection: days with no data inside the observed range.

The pipeline-health question "did ingestion skip a day?": generate the
full day sequence between the table's min and max event dates and
anti-join the observed days — remaining days are the holes.

Plan shape: ONE groupBy(day) over the data (combine-friendly, days
are low-cardinality), one 1-row min/max aggregate, the calendar
explodes MAP-SIDE from ``sequence(min_day, max_day)`` (a few thousand
rows even for a decade), and a broadcast left-anti join finds the
holes. Zero data-sized shuffles beyond the day rollup.

Scale notes (100 TB): day cardinality is bounded by the time span,
never by data volume; the anti-join's both sides are |days|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_COLS = ["missing_day"]


def missing_days(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Days in [min(ts)::date, max(ts)::date] with zero rows, ascending."""
    observed = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.to_date(F.col(ts_col)).alias("day"))
        .groupBy("day")
        .agg(F.lit(1).alias("_seen"))
    )
    bounds = observed.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = bounds.selectExpr(
        "explode(sequence(d0, d1, interval 1 day)) AS day"
    )
    return (
        calendar.join(F.broadcast(observed), "day", "left_anti")
        .selectExpr("cast(day AS string) AS missing_day")
        .orderBy("missing_day")
        .select(*GAP_COLS)
    )


def missing_days_sql(table: str, ts_col: str = "ts") -> str:
    """DuckDB mirror (generate_series of dates)."""
    return f"""
WITH observed AS (
  SELECT DISTINCT CAST({ts_col} AS DATE) AS day
  FROM {table} WHERE {ts_col} IS NOT NULL
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM observed),
calendar AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT CAST(c.day AS VARCHAR) AS missing_day
FROM calendar c LEFT JOIN observed o ON c.day = o.day
WHERE o.day IS NULL
ORDER BY missing_day
"""
