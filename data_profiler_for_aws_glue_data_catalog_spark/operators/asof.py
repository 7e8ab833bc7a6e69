"""As-of (nearest-preceding-event) join.

Aligns each left row with the latest right row whose timestamp is <= the
left row's, per key — the standard primitive for enriching events with the
most recent snapshot/state (feature values, prices, session context) in
training-data pipelines. Spark has no native as-of join; the naive
formulations both fail at scale:

- ``left JOIN right ON l.key = r.key AND r.ts <= l.ts`` + window-max:
  a non-equi conjunct Spark executes as the equi-join PLUS a per-key
  all-pairs filter — every left row pairs with every earlier right row of
  its key before the max is taken (quadratic in per-key history length).
- per-key ``collect`` + Python bisect: driver-bound, not distributed.

This implementation uses the UNION-MERGE shape instead — no join operator
at all:

1. tag right rows 0, left rows 1, union the (key, ts, payload) frames;
2. one window pass partitioned by key ordered by (ts, tag, order)
   carrying ``last(<right payload>, ignorenulls=True)`` over
   rows-unbounded-preceding — each left row picks up the nearest
   preceding right payload in the same sorted pass;
3. keep only left rows.

Cost: ONE hash shuffle of |left| + |right| rows on the key + a per-key
sort — the same complexity as a sort-merge join, with no pair explosion
regardless of history length. Skewed keys are AQE's standard case.

Determinism contract: ties sort (ts, tag right-before-left, right order
column) so a right row at exactly the left timestamp IS matched
(inclusive >=), and among right rows sharing (key, ts) the one with the
largest order column wins — mirrored exactly by the DuckDB ASOF-join
oracle (oracle_ext.asof_join_sql dedups right to the max-order row per
(key, ts) first, which is also the sane contract for real data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    left_id: str = "event_id",
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the nearest
    ``right`` row with ``right.on <= left.on`` and equal ``by`` key
    (NULL payload when no right row precedes).

    ``right_cols`` are carried across; the first one also serves as the
    deterministic tie-breaker among right rows sharing (by, on) — the
    LARGEST value wins.
    """
    order_col = right_cols[0]
    payload = F.struct(*[F.col(c) for c in right_cols])

    r = right.where(F.col(on).isNotNull() & F.col(by).isNotNull()).select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        F.col(order_col).alias("_ord"),
        payload.alias("_payload"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
    )
    l = left.where(F.col(on).isNotNull() & F.col(by).isNotNull()).select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_ord"].dataType).alias("_ord"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.col(left_id).alias("_lid"),
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("_tag"), F.col("_ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("_tag") == 1).select(
        F.col("_lid").alias(left_id),
        F.col(by),
        F.col(on),
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
