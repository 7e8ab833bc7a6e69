"""Durable Parquet metrics sink.

Reference behavior (DataProfilerForAWSGlueDataCatalog.scala:231-252): after
profiling each table the long metrics relation is enriched with

    db_name_embed     string     -- the database profiled
    table_name_embed  string     -- the table profiled
    profiler_run_dt   date       -- run date (yyyy-MM-dd)
    profiler_run_ts   timestamp  -- run timestamp, second granularity

and appended, coalesced to one file, under the hive-style prefix
``.../db_name=<db>/table_name=<table>``.

Spark-first differences (same read-back contract):

- ONE write job for the whole database: the metrics relation keeps real
  ``db_name``/``table_name`` columns and goes through
  ``write.partitionBy("db_name", "table_name")`` — Spark lays out the same
  ``db_name=.../table_name=...`` directories the reference builds by string
  concatenation, but all tables land in one job instead of a driver-side
  per-table loop (Main.scala:198 ``dfs.foreach``).
- The pre-write ``repartition(db_name, table_name)`` reproduces the
  reference's one-file-per-table layout (its ``coalesce(1)``) without
  serializing the whole write onto one task: one task per table partition.
  Metrics relations are O(tables x columns x metrics) rows — a 100k-table
  catalog profiles into a few hundred MB, so one file per partition is the
  right layout at any scale this sink can reach.
- The run timestamp is formatted 24-hour (``HH:mm:ss``); the reference's
  ``hh:mm:ss`` (Main.scala:241) is a 12-hour formatting bug that folds
  afternoon runs onto morning timestamps.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ("db_name", "table_name")


def _run_strings(run_ts: datetime | None) -> tuple[str, str]:
    """(yyyy-MM-dd, yyyy-MM-dd HH:mm:ss) for the run — second granularity,
    matching the reference's formatter output (with the HH fix)."""
    ts = run_ts or datetime.now(timezone.utc)
    return ts.strftime("%Y-%m-%d"), ts.strftime("%Y-%m-%d %H:%M:%S")


def enrich_metrics(
    metrics: DataFrame,
    db_name: str,
    table_name: str | None = None,
    run_ts: datetime | None = None,
) -> DataFrame:
    """Add the four embedded provenance columns plus the partition columns.

    ``table_name``: pass a string for a single-table relation; leave None
    when ``metrics`` already carries a ``table_name`` column (the
    profile_database shape).
    """
    if table_name is not None:
        metrics = metrics.withColumn("table_name", F.lit(table_name))
    elif "table_name" not in metrics.columns:
        raise ValueError(
            "enrich_metrics: pass table_name= or a relation with a "
            "table_name column"
        )
    dt_s, ts_s = _run_strings(run_ts)
    return (
        metrics.withColumn("db_name_embed", F.lit(db_name))
        .withColumn("table_name_embed", F.col("table_name"))
        .withColumn("profiler_run_dt", F.lit(dt_s).cast("date"))
        .withColumn("profiler_run_ts", F.lit(ts_s).cast("timestamp"))
        .withColumn("db_name", F.lit(db_name))
    )


def write_metrics_parquet(
    metrics: DataFrame,
    path: str,
    db_name: str,
    table_name: str | None = None,
    run_ts: datetime | None = None,
    mode: str = "append",
) -> None:
    """Append the enriched metrics relation under db_name=/table_name=.

    Append-mode is the reference's contract: successive runs accumulate and
    readers separate them by ``profiler_run_ts``.
    """
    enriched = enrich_metrics(metrics, db_name, table_name, run_ts)
    (
        enriched.repartition(*[F.col(c) for c in PARTITION_COLS])
        .write.mode(mode)
        .partitionBy(*PARTITION_COLS)
        .parquet(path)
    )


def read_metrics_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a metrics sink back; partition columns come back as strings."""
    return spark.read.option(
        "basePath", path
    ).parquet(path)


def compact_parquet(
    df: DataFrame,
    out_path: str,
    target_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    input_bytes: int | None = None,
) -> DataFrame:
    """Small-file compaction: rewrite a relation as ``target_files``
    parquet files and return the read-back relation.

    The operational complement of operators/file_balance.py's diagnosis —
    the reference's ``coalesce(1)`` (DataProfilerForAWSGlueDataCatalog.scala:248) is this with
    target_files=1, sensible only for tiny metrics output. For data
    tables pass ``input_bytes`` (e.g. summed file sizes from the source
    listing) and the file count becomes ceil(bytes / target_file_bytes),
    the standard 128 MB-object compaction policy.

    ``repartition(n)`` is a round-robin exchange: output files are
    size-balanced regardless of input skew (contrast coalesce(n), which
    only glues existing partitions and inherits their imbalance — but
    avoids the shuffle; use coalesce when inputs are already balanced).
    At 100 TB this runs per partition-of-a-table (e.g. per day), not
    globally — the shuffle is bounded by the partition size.
    """
    if target_files is None:
        if input_bytes is None:
            raise ValueError("compact_parquet: pass target_files or input_bytes")
        target_files = max(1, -(-input_bytes // target_file_bytes))
    df.repartition(target_files).write.mode("overwrite").parquet(out_path)
    return df.sparkSession.read.parquet(out_path)
