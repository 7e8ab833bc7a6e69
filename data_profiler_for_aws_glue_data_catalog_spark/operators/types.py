"""Column type dispatch.

The reference dispatches on the *catalog string* of the type with regex
normalization for decimals (isString/isNumeric,
DataProfilerForAWSGlueDataCatalog.scala:351-365). We dispatch on Spark
``DataType`` instances instead — no string parsing, decimals covered by
``NumericType`` directly.

Buckets (reference Main.scala:282-293):
- text: string/varchar/char            -> default + expensive text metrics
- numeric: all integral/fractional/decimal -> the 9 numeric metrics
- convertible: boolean/date (+timestamp as our opt-in extension; the
  reference commented timestamp support out, Main.scala:60-62) -> cast to
  string, then profiled as text, only when profile_unsupported_types
- everything else (arrays/maps/structs/binary): skipped, same as the
  reference (no else-branch at Main.scala:286-292)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    CharType,
    DataType,
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
    VarcharType,
)

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig

TEXT_TYPES = (StringType, VarcharType, CharType)

TEXT = "text"
NUMERIC = "numeric"
CONVERT = "convert"


def classify(dtype: DataType, config: ProfilerConfig) -> str | None:
    """Return the profiling bucket for a column type, or None to skip."""
    if isinstance(dtype, TEXT_TYPES):
        return TEXT
    if isinstance(dtype, NumericType):
        return NUMERIC
    if not config.profile_unsupported_types:
        return None
    if isinstance(dtype, (BooleanType, DateType)):
        return CONVERT
    if (
        isinstance(dtype, (TimestampType, TimestampNTZType))
        and config.profile_timestamps
    ):
        return CONVERT
    return None


def cast_convertibles(df: DataFrame, config: ProfilerConfig) -> DataFrame:
    """Cast convertible columns to string in ONE select.

    The reference folds `withColumn` per column
    (Main.scala:368-386) — O(columns) plan nodes; a single select keeps the
    plan flat. Timestamps are rendered in a session-timezone-independent
    format only when profiled.
    """
    from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import sql_ident

    out = []
    for f in df.schema.fields:
        # sql_ident: a raw name with a backtick/dot would otherwise be
        # PARSED as a (broken) multi-part attribute reference by F.col
        if classify(f.dataType, config) == CONVERT:
            out.append(F.col(sql_ident(f.name)).cast("string").alias(f.name))
        else:
            out.append(F.col(sql_ident(f.name)))
    return df.select(*out)


def align_union(frames: list[DataFrame]) -> DataFrame:
    """Schema-evolution-tolerant union: unify the column set across
    snapshots written at different schema versions (the day-over-day
    reality of any long-lived table).

    Columns missing from a frame are NULL-filled; columns present under
    conflicting types are widened by Spark's own ``unionByName`` cast
    resolution after an explicit common-type projection: for each name,
    the FIRST frame that has it defines the target type, later variants
    cast to it (cast failures -> NULL via try_cast, never a job abort —
    reading old snapshots must not be able to kill a backfill).

    Pure metadata + map-side projections; the union itself adds no
    shuffle. Column order follows first appearance across ``frames``.
    """
    if not frames:
        raise ValueError("align_union: need at least one frame")
    target: dict[str, str] = {}
    for f in frames:
        for field in f.schema.fields:
            target.setdefault(field.name, field.dataType.simpleString())
    cols = list(target)
    out = None
    for f in frames:
        have = {x.name for x in f.schema.fields}
        proj = f.select(
            *[
                F.expr(f"try_cast(`{c}` AS {target[c]}) AS `{c}`")
                if c in have
                else F.lit(None).cast(target[c]).alias(c)
                for c in cols
            ]
        )
        out = proj if out is None else out.unionByName(proj)
    return out
