"""Touch attribution: first/last touch per conversion within a lookback.

The standard events-analytics credit assignment — each conversion event
credits the touch (click/view/...) that started the journey (first
touch) and the one that closed it (last touch), looking back a bounded
window. Composes the engine's bucketized range-join machinery
(operators/interval_join.py's bucket trick): conversions become
intervals ``[conv_ts - lookback, conv_ts]``, touches are points, and the
candidate join collides on (user, time bucket) — never a cross product,
never an unbounded per-user window.

Plan shape: touches explode into at most ceil(lookback/bucket)+1 bucket
replicas of the CONVERSION side (the bounded side), candidates equi-join
on (user, bucket), the range predicate filters, and one groupBy per
conversion picks first/last with (ts, id) tie-breaks. Shuffle keys are
(user, bucket) — hot users shard across time.

Determinism: min_by/max_by over (ts, id) structs; counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTR_COLS = [
    "conv_id", "user_id", "conv_ts",
    "first_touch_id", "first_touch_type",
    "last_touch_id", "last_touch_type", "n_touches",
]


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 24,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per conversion with first/last touch credit inside
    ``[conv_ts - lookback, conv_ts]`` (touch strictly before conversion;
    conversions with no touch in window are kept with NULL credit)."""
    lb_us = lookback_hours * 3600 * 1_000_000
    bucket_us = lb_us  # bucket = lookback -> each conv spans <= 2 buckets
    conv = events.where(
        (F.col(type_col) == conversion_type)
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        F.col(id_col).alias("conv_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.where(
        F.col(type_col).isin(*touch_types)
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        F.col(id_col).alias("touch_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
        F.floor(F.unix_micros(F.col(ts_col)) / bucket_us).alias("_b"),
    )
    # conversion side replicates into the buckets its lookback touches
    conv_b = conv.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.unix_micros(F.col("conv_ts")) - lb_us) / bucket_us),
                F.floor(F.unix_micros(F.col("conv_ts")) / bucket_us),
            )
        ).alias("_b"),
    )
    cand = conv_b.join(touch, ["user_id", "_b"]).where(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.unix_micros(F.col("touch_ts"))
            >= F.unix_micros(F.col("conv_ts")) - lb_us
        )
    )
    first_pick = F.struct(F.col("touch_ts"), F.col("touch_id"))
    credited = cand.groupBy("conv_id", "user_id", "conv_ts").agg(
        F.min_by("touch_id", first_pick).alias("first_touch_id"),
        F.min_by("touch_type", first_pick).alias("first_touch_type"),
        F.max_by("touch_id", first_pick).alias("last_touch_id"),
        F.max_by("touch_type", first_pick).alias("last_touch_type"),
        F.count(F.lit(1)).alias("n_touches"),
    )
    return (
        conv.join(credited, ["conv_id", "user_id", "conv_ts"], "left_outer")
        .withColumn("n_touches", F.coalesce(F.col("n_touches"), F.lit(0)))
        .select(*ATTR_COLS)
    )


def touch_attribution_sql(
    table: str = "events",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 24,
) -> str:
    """DuckDB mirror (plain correlated range join — the oracle does not
    need the bucket trick)."""
    types = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts
  FROM {table}
  WHERE event_type = '{conversion_type}' AND ts IS NOT NULL
    AND user_id IS NOT NULL
),
touch AS (
  SELECT event_id AS touch_id, user_id, ts AS touch_ts,
         event_type AS touch_type
  FROM {table}
  WHERE event_type IN ({types}) AND ts IS NOT NULL AND user_id IS NOT NULL
),
cand AS (
  SELECT c.conv_id, c.user_id, c.conv_ts, t.touch_id, t.touch_ts,
         t.touch_type
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.touch_ts < c.conv_ts
   AND t.touch_ts >= c.conv_ts - INTERVAL {lookback_hours} HOUR
),
credited AS (
  SELECT conv_id, user_id, conv_ts,
    (SELECT touch_id FROM cand c2 WHERE c2.conv_id = c.conv_id
       ORDER BY touch_ts ASC, touch_id ASC LIMIT 1) AS first_touch_id,
    (SELECT touch_type FROM cand c2 WHERE c2.conv_id = c.conv_id
       ORDER BY touch_ts ASC, touch_id ASC LIMIT 1) AS first_touch_type,
    (SELECT touch_id FROM cand c2 WHERE c2.conv_id = c.conv_id
       ORDER BY touch_ts DESC, touch_id DESC LIMIT 1) AS last_touch_id,
    (SELECT touch_type FROM cand c2 WHERE c2.conv_id = c.conv_id
       ORDER BY touch_ts DESC, touch_id DESC LIMIT 1) AS last_touch_type,
    COUNT(*) AS n_touches
  FROM cand c GROUP BY conv_id, user_id, conv_ts
)
SELECT cv.conv_id, cv.user_id, cv.conv_ts,
  cr.first_touch_id, cr.first_touch_type,
  cr.last_touch_id, cr.last_touch_type,
  COALESCE(cr.n_touches, 0) AS n_touches
FROM conv cv LEFT OUTER JOIN credited cr
  ON cv.conv_id = cr.conv_id AND cv.user_id = cr.user_id
 AND cv.conv_ts = cr.conv_ts
"""
