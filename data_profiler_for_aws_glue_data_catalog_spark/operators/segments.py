"""Segment deviation ranking: which segment moves the metric most?

The drill-down after an aggregate looks off: per-segment mean of a
value column vs the overall mean, ranked by absolute relative
deviation. Complements grouped_profile (full per-segment metric sets)
with the one-screen "who's responsible" view.

Plan shape: ONE groupBy(segment) shuffle computes per-segment decimal
sums/counts; the overall row derives from the SEGMENT relation (sum of
sums), not a second scan, and broadcast-cross-joins back. Means are
DECIMAL(27,6)-accumulated -> order-free; deviations ROUND6'd.

Scale notes (100 TB): one combine-friendly shuffle over |segments|
keys; output is |segments| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

SEGMENT_DEV_COLS = [
    "segment", "n", "seg_mean", "overall_mean", "abs_diff", "rel_diff",
]


def segment_deviations(
    df: DataFrame, segment_col: str, value_col: str
) -> DataFrame:
    """(segment, n, seg_mean, overall_mean, abs_diff, rel_diff) per
    segment (NULL segments profile like any other; NULL values excluded
    from means)."""
    segs = df.groupBy(F.col(segment_col).cast("string").alias("segment")).agg(
        F.expr(f"sum(cast(`{value_col}` AS decimal(27,6)))").alias("s"),
        F.expr(f"count(`{value_col}`)").alias("n"),
    )
    overall = segs.agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt")
    )
    seg_mean = "cast(s AS double) / cast(n AS double)"
    overall_mean = "cast(st AS double) / cast(nt AS double)"
    return (
        segs.crossJoin(F.broadcast(overall))
        .selectExpr(
            "segment",
            "n",
            f"cast({ROUND6.format(x=seg_mean)} AS double) AS seg_mean",
            f"cast({ROUND6.format(x=overall_mean)} AS double) AS overall_mean",
            f"cast({ROUND6.format(x=f'abs(({seg_mean}) - ({overall_mean}))')} AS double) AS abs_diff",
            f"cast({ROUND6.format(x=f'abs(({seg_mean}) - ({overall_mean})) / abs({overall_mean})')} AS double) AS rel_diff",
        )
        .select(*SEGMENT_DEV_COLS)
    )


def segment_deviations_sql(
    table: str, segment_col: str, value_col: str
) -> str:
    """DuckDB mirror (same decimal accumulation and rounding)."""
    seg_mean = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    overall_mean = "CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)"
    return f"""
WITH segs AS (
  SELECT CAST({segment_col} AS VARCHAR) AS segment,
    SUM(CAST({value_col} AS DECIMAL(27,6))) AS s,
    COUNT({value_col}) AS n
  FROM {table} GROUP BY 1
),
overall AS (SELECT SUM(s) AS st, SUM(n) AS nt FROM segs)
SELECT segment, n,
  CAST({ROUND6.format(x=seg_mean)} AS DOUBLE) AS seg_mean,
  CAST({ROUND6.format(x=overall_mean)} AS DOUBLE) AS overall_mean,
  CAST({ROUND6.format(x=f"ABS(({seg_mean}) - ({overall_mean}))")} AS DOUBLE) AS abs_diff,
  CAST({ROUND6.format(x=f"ABS(({seg_mean}) - ({overall_mean})) / ABS({overall_mean})")} AS DOUBLE) AS rel_diff
FROM segs CROSS JOIN overall
"""
