"""Table sources.

The reference resolves tables through the Glue-backed Hive metastore
(``sqlContext.table``, DataProfilerForAWSGlueDataCatalog.scala:263) or the
session catalog in local mode (:188-195). Our engine accepts any
name->DataFrame mapping; this module builds one from a directory of parquet
files (the driver's testdata layout) or registers them as temp views so
both the profiler and plain ``spark.sql`` queries can use them.

Scale note: ``spark.read.parquet`` on a directory of row-grouped parquet is
already the right scan primitive at 100 TB — split planning by
``spark.sql.files.maxPartitionBytes``, predicate pushdown and column
pruning all apply; nothing custom is needed at the source layer.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), from footer metadata only.

    For a directory, the union over EVERY file's footer is taken — files
    with heterogeneous schemas (e.g. a column upgraded micros->nanos
    mid-table) would otherwise be mis-detected from a single sample.
    Driver-side metadata reads only; at 100 TB prefer a catalog-declared
    schema over footer sniffing.
    """
    if os.path.isdir(path):
        cols: set[str] = set()
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                cols.update(_nanos_timestamp_columns(os.path.join(path, f)))
        return sorted(cols)
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan that tolerates TIMESTAMP(NANOS) columns.

    Spark 4 rejects nanosecond parquet timestamps outright
    (PARQUET_TYPE_ILLEGAL); with ``spark.sql.legacy.parquet.nanosAsLong``
    they scan as bigint nanos, and we restore TimestampType by a cheap
    column projection (micros = nanos div 1000 — same truncation DuckDB
    applies reading the same file). The footer sniff is driver-side
    metadata only; the scan itself stays fully native/vectorized.

    The conf is session-global and deliberately NOT restored after the
    call: the returned DataFrame is lazy, and its physical scan re-reads
    the conf at execution time — restoring it would break the very frame
    we return. It only changes behavior for nanos columns, which this
    session can't otherwise read at all. (A per-read option does not exist
    for this legacy knob.)
    """
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return _ntz_to_ltz(spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
        )
    return _ntz_to_ltz(df)


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Coerce TIMESTAMP_NTZ columns to TimestampType (session tz).

    Parquet written with isAdjustedToUTC=false infers as NTZ in Spark 4;
    the engine's time operators (windows, as-of, epoch bucketing via
    unix_micros) take TimestampType. Under a UTC session (the engine's
    documented requirement for cross-engine determinism) the cast is a
    pure re-tag — same micros value DuckDB reads from the same file.
    """
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if not ntz:
        return df
    return df.select(
        *[
            F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c)
            for c in df.columns
        ]
    )


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | StructType | None = None,
    **options: str,
) -> DataFrame:
    """Format-dispatched table read: parquet (default), csv, json, orc.

    The reference profiles whatever format the Hive/Glue metastore serves a
    table in (DataProfilerForAWSGlueDataCatalog.scala:263 resolves by name,
    not format); our registry equivalent dispatches on an explicit ``fmt``
    or the file extension. Parquet goes through the TIMESTAMP(NANOS)-safe
    path; the text formats default to ``header=true`` (csv) and get an
    explicit ``schema`` (DDL string or StructType) when the caller has one — schema inference over a
    100 TB text table is a full extra scan, so at scale pass the schema
    from the catalog instead of inferring.
    """
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = ext if ext in ("csv", "json", "orc") else "parquet"
    if fmt == "parquet":
        return read_parquet_table(spark, path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    return reader.options(**options).format(fmt).load(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """name -> DataFrame for every ``<name>.parquet`` present in sf_dir."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = read_parquet_table(spark, path)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load and register each table as a replaceable temp view."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
