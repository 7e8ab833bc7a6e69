"""Bucketed-table sink: pre-shuffled storage for co-located joins.

The 100 TB join strategy the partitioned Parquet sink can't give you:
``bucketBy(n, key)`` + ``sortBy(key)`` persists each table ALREADY
hash-partitioned (and per-file sorted) on its join key. Two tables
bucketed on the same key with the same bucket count then sort-merge
join with NO Exchange on either side — the shuffle was paid once at
write time and is amortized over every subsequent join/aggregation on
that key (`tests/test_plans.py` asserts the exchange-free plan).

This is idiomatic Spark bucketing (DataFrameWriter.bucketBy — public
API; the reference has no analog since it delegates storage layout to
the Glue catalog's path conventions).

Usage contract:
- tables are EXTERNAL (explicit ``path``) so the data outlives the
  session catalog entry; re-registering after a restart is just
  ``register_bucketed`` again.
- write once with ``n_buckets`` sized so one bucket of the LARGEST
  co-bucketed table fits an executor (e.g. 100 TB fact / 4096 buckets
  ≈ 25 GB per bucket pre-compression — size to taste); every table
  sharing the key must use the SAME count to co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external bucketed+sorted Parquet table."""
    sort_cols = sort_cols or bucket_cols
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def register_bucketed(
    spark: SparkSession, table_name: str
) -> DataFrame:
    """Read a bucketed table back through the session catalog (the
    catalog entry carries the bucket spec — reading the bare path would
    lose it and reintroduce the shuffle)."""
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planner emits
    sort-merge join with no Exchange when the bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
