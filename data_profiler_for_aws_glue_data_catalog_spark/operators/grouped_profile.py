"""Segmented profiles: the fused metric set, grouped by a key column.

Extension past the reference surface (which profiles whole tables only):
per-segment data quality — profile every column of a table once PER VALUE
of a grouping column (data source, tenant, market segment, label...).
This is the workhorse view for training-data pipelines: "which source's
documents went incomplete this week" is a grouped profile plus the
anomaly detector.

Execution shape (100 TB notes)
------------------------------
ONE ``groupBy(key)`` over one scan with every metric for every column
fused into the grouped aggregation — the same shape as the windowed
profile (streaming/windowed_profile.py), whose expression builder this
reuses with the time window swapped for a key. Shuffle bytes ~ segments
x columns x metrics (map-side partial aggregation), independent of row
count. Skewed segment keys cost nothing special here: the aggregate
state per key is fixed-size, so AQE's post-shuffle coalescing handles
imbalance; there is no per-row join anywhere.

NULL group keys form their own segment (matching SQL GROUP BY), unlike
the windowed profile where unstamped rows are excluded — a NULL segment
is a data-quality signal in itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import METRIC_COLS
from data_profiler_for_aws_glue_data_catalog_spark.streaming.windowed_profile import (
    _windowed_aggs,
)

GROUPED_COLS = ["group_value", *METRIC_COLS]


def grouped_profile(
    df: DataFrame,
    group_col: str,
    config: ProfilerConfig | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Profile every column per value of ``group_col``.

    Output: (group_value string, entity, instance, name, value, type) —
    the long metrics relation keyed by segment. The grouping column
    itself is not profiled. ``approx_distinct`` adds HLL++
    ApproxCountDistinct per segment (sketch: rows-only in the
    correctness contract, like the static profile).
    """
    config = config or ProfilerConfig()
    exprs, structs = _windowed_aggs(df, group_col, config, approx_distinct)
    grouped = df.groupBy(
        F.col(group_col).cast("string").alias("group_value")
    ).agg(*exprs)
    return grouped.select(
        "group_value", F.explode(F.array(*structs)).alias("kv")
    ).select("group_value", "kv.*").select(*GROUPED_COLS)


def rollup_profile(
    df: DataFrame,
    group_col: str,
    config: ProfilerConfig | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Segmented profile + the all-rows level in ONE pass.

    ``df.rollup(key)`` plans GROUPING SETS ((key), ()) through a single
    Expand over one scan — per-segment rows plus a total row labeled
    ``<all>``, without a second aggregation job. ``grouping()``
    disambiguates the total level from a genuine NULL segment (which
    keeps its NULL group_value).
    """
    config = config or ProfilerConfig()
    exprs, structs = _windowed_aggs(df, group_col, config, approx_distinct)
    # grouping() must reference an attribute of the rollup list, so the
    # cast is materialized as a named column first.
    with_gv = df.withColumn("_gv", F.col(group_col).cast("string"))
    grouped = with_gv.rollup("_gv").agg(
        F.expr("grouping(_gv)").alias("_lvl"), *exprs
    )
    gv = F.when(F.col("_lvl") == 1, F.lit("<all>")).otherwise(F.col("_gv"))
    return (
        grouped.select(
            gv.alias("group_value"),
            F.explode(F.array(*structs)).alias("kv"),
        )
        .select("group_value", "kv.*")
        .select(*GROUPED_COLS)
    )


CUBE_COLS = ["group_a", "group_b", *METRIC_COLS]


def cube_profile(
    df: DataFrame,
    col_a: str,
    col_b: str,
    config: ProfilerConfig | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Two-key CUBE profile: every metric at all four grouping levels —
    (a,b), (a), (b), () — in ONE pass.

    ``df.cube`` plans GROUPING SETS through a single Expand over one
    scan (4x the aggregate input rows, still one shuffle); grouped-out
    levels are labeled ``<all>``, with ``grouping()`` distinguishing
    them from genuine NULL keys. Shuffle bytes ~ 4 x segments x columns
    x metrics — independent of row count, so the shape holds at 100 TB.
    """
    config = config or ProfilerConfig()
    # build metric exprs over every profiled column except both keys
    exprs, structs = _windowed_aggs(df.drop(col_b), col_a, config, approx_distinct)
    with_g = df.withColumn("_ga", F.col(col_a).cast("string")).withColumn(
        "_gb", F.col(col_b).cast("string")
    )
    grouped = with_g.cube("_ga", "_gb").agg(
        F.expr("grouping(_ga)").alias("_la"),
        F.expr("grouping(_gb)").alias("_lb"),
        *exprs,
    )
    ga = F.when(F.col("_la") == 1, F.lit("<all>")).otherwise(F.col("_ga"))
    gb = F.when(F.col("_lb") == 1, F.lit("<all>")).otherwise(F.col("_gb"))
    return (
        grouped.select(
            ga.alias("group_a"),
            gb.alias("group_b"),
            F.explode(F.array(*structs)).alias("kv"),
        )
        .select("group_a", "group_b", "kv.*")
        .select(*CUBE_COLS)
    )
