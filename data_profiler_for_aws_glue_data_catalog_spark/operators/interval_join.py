"""Bucketed interval (range) join: points-in-interval at scale.

``point.ts BETWEEN interval.start AND interval.end`` is a non-equi
predicate; Spark's only direct physical plan for it is
BroadcastNestedLoopJoin — O(|points| x |intervals|) pair evaluations per
key, the same scale-killer the dedup family avoids. This operator rewrites
the range predicate as an EQUI-join on fixed-width time buckets:

1. each point maps to ONE bucket: floor(ts / width);
2. each interval explodes to the buckets it overlaps (sequence of
   floor(start/width) .. floor((end-1)/width) — end exclusive, so an
   interval ending exactly on a boundary does not bleed into the next
   bucket);
3. hash equi-join on (key, bucket), then the exact containment filter
   ``start <= ts < end`` prunes boundary false candidates.

Each (point, interval) match is produced exactly once — a point lives in
exactly one bucket — so no dedup pass is needed.

Scale notes (100 TB)
--------------------
- Cost: one shuffle of points + exploded intervals on (key, bucket).
  Choose ``bucket`` near the TYPICAL interval length: much smaller
  multiplies the interval-side explosion (length/width rows per
  interval), much larger piles unrelated points into the same bucket
  (join amplification before the filter). Either way it degrades
  linearly, never quadratically.
- Degenerate long intervals (open sessions spanning months) fan out to
  many buckets; cap them upstream or split the interval relation by
  length and broadcast the tiny long-interval slice.
- AQE handles residual bucket skew (hot keys x hot hours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.sessions import _gap_to_us


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    key: str = "user_id",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket: str = "1 day",
    point_cols: tuple[str, ...] = ("event_id",),
    interval_cols: tuple[str, ...] = ("session_start",),
) -> DataFrame:
    """Rows (key, *point_cols, point_ts, *interval_cols) for every point
    falling inside [start, end) of an interval with the same key."""
    w_us = _gap_to_us(bucket)
    p = points.where(
        F.col(point_ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(point_ts),
        *[F.col(c) for c in point_cols],
        F.floor(F.unix_micros(F.col(point_ts)) / w_us).alias("_b"),
    )
    i = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(start_col),
        F.col(end_col),
        *[F.col(c) for c in interval_cols if c not in (start_col, end_col)],
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / w_us),
                F.floor((F.unix_micros(F.col(end_col)) - 1) / w_us),
            )
        ).alias("_b"),
    )
    out_interval_cols = [
        c for c in interval_cols if c in (start_col, end_col)
    ] + [c for c in interval_cols if c not in (start_col, end_col)]
    return (
        p.join(i, on=[key, "_b"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .select(
            F.col(key),
            *[F.col(c) for c in point_cols],
            F.col(point_ts),
            *[F.col(c) for c in out_interval_cols],
        )
    )
