"""Wide (pivoted) presentation of the long metrics relation.

The engine's native output is the reference's long shape
(entity, instance, name, value, type) — right for sinks and history,
wrong for humans and notebooks. This pivot turns it into one row per
column with one metric per field.

Plan shape: `groupBy(instance, type).pivot(name, VALUES)` with an
explicit metric-name list — pivoting with declared values skips the
extra distinct-collection job Spark otherwise runs, and the input is
the already-tiny metrics relation, so the single shuffle is
screen-sized. `first(value)` is exact: (instance, name) is unique in a
profile run.

Scale notes: operates on metrics (O(tables x columns x metrics) rows),
never on data — scale-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDE_METRICS = [
    "Completeness", "Maximum", "Minimum", "Mean", "StandardDeviation", "Sum",
]


def profile_wide(
    metrics: DataFrame, metric_names: list[str] | None = None
) -> DataFrame:
    """(instance, type, <one column per metric>) for column-entity rows."""
    names = metric_names or DEFAULT_WIDE_METRICS
    return (
        metrics.where(F.col("entity") == "Column")
        .groupBy("instance", "type")
        .pivot("name", names)
        .agg(F.first("value"))
    )


def profile_wide_sql(
    profile_sql: str, metric_names: list[str] | None = None
) -> str:
    """DuckDB mirror: conditional aggregation over the same long relation
    (`profile_sql` is any query producing the long metrics shape)."""
    names = metric_names or DEFAULT_WIDE_METRICS
    cols = ",\n  ".join(
        f"MAX(CASE WHEN name = '{n}' THEN value END) AS \"{n}\"" for n in names
    )
    return f"""
SELECT instance, type,
  {cols}
FROM ({profile_sql})
WHERE entity = 'Column'
GROUP BY instance, type
"""
