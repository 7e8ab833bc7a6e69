"""Source-layer tests: format dispatch and the TIMESTAMP(NANOS) path."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark import profile_table
from data_profiler_for_aws_glue_data_catalog_spark.sources import read_table

SF_SMOKE = "/root/testdata/sf0.001"


def _metric_map(df):
    return {
        (r["instance"], r["name"]): r["value"]
        for r in df.collect()
    }


def test_read_table_format_dispatch(spark, tmp_path):
    """The same relation profiled from parquet, csv and json yields the
    same metrics (csv/json get an explicit schema — catalog-style)."""
    base = read_table(spark, f"{SF_SMOKE}/region.parquet")
    schema = base.schema

    csv_dir = str(tmp_path / "region_csv")
    json_dir = str(tmp_path / "region_json")
    base.coalesce(1).write.option("header", "true").csv(csv_dir)
    base.coalesce(1).write.json(json_dir)

    expected = _metric_map(profile_table(base))
    for path, fmt in ((csv_dir, "csv"), (json_dir, "json")):
        got = _metric_map(profile_table(read_table(spark, path, fmt=fmt, schema=schema)))
        assert got == expected, f"{fmt} profile diverged"


def test_read_table_infers_format_from_extension(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    p = str(tmp_path / "t.csv")
    df.coalesce(1).write.option("header", "true").csv(p)
    back = read_table(spark, p, schema="id int, s string")
    assert back.orderBy("id").collect() == df.orderBy("id").collect()


def test_events_timestamps_readable(spark):
    """events.parquet must come back with a usable timestamp column
    (TIMESTAMP or TIMESTAMP_NTZ depending on the writer's UTC flag)."""
    ev = read_table(spark, f"{SF_SMOKE}/events.parquet")
    ts_fields = [
        f
        for f in ev.schema.fields
        if f.dataType.typeName() in ("timestamp", "timestamp_ntz")
    ]
    assert ts_fields, "no timestamp column restored"
    assert ev.where(F.col(ts_fields[0].name).isNotNull()).count() > 0


def test_nanos_timestamps_restored(spark, tmp_path):
    """A parquet file with TIMESTAMP(NANOS) — unreadable by a plain Spark 4
    scan — must come back as TimestampType with nanos truncated to micros."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "nanos.parquet")
    ts = pa.array([1_700_000_000_123_456_789, 1_700_000_001_000_000_001],
                  type=pa.timestamp("ns"))
    pq.write_table(pa.table({"id": pa.array([1, 2]), "ts": ts}), path)

    back = read_table(spark, path)
    (ts_field,) = [f for f in back.schema.fields if f.name == "ts"]
    assert ts_field.dataType.typeName() == "timestamp"
    micros = [
        r[0]
        for r in back.orderBy("id")
        .select(F.unix_micros(F.col("ts")))
        .collect()
    ]
    assert micros == [1_700_000_000_123_456, 1_700_000_001_000_000]
