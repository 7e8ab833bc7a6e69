"""Application entry point — the reference CLI re-expressed.

Same argument surface as the reference (CommandLineArgs.scala:21-30,
option registration at DataProfilerForAWSGlueDataCatalog.scala:80-127), with the
local/remote split made explicit:

    python -m data_profiler_for_aws_glue_data_catalog_spark.cli \
        --dbName mydb [--region eu-west-1] [--compExp true] \
        [--statsPrefix DQP] [--outputPrefix /path/or/s3a/prefix] \
        [--profileUnsupportedTypes true] [--noOfBins 10] [--quantiles 10] \
        [--catalogJson /path/metadata.json]

Lifecycle parity with runProfiler (Main.scala:164-254):

1. enumerate tables — ``--region`` set: remote Glue catalog (paginated,
   boto3 import-gated); otherwise the session catalog
   (``spark.catalog.listTables``);
2. profile every table — ONE lazy plan for the whole database (the
   reference loops tables sequentially);
3. publish — catalog parameter sink (remote Glue or the local JSON store
   at ``--catalogJson``) + partitioned Parquet metrics sink when
   ``--outputPrefix`` is set (the reference's ``--s3BucketPrefix``; any
   Hadoop-visible URI works: local path, s3a://, hdfs://).

Differences from the reference, all deliberate: 24-hour run timestamps
(their ``hh:mm:ss`` folds PM onto AM), full Glue pagination (they profile
only the first page), one collect per table for parameter publication
(they collect once per column).
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime, timezone

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig


def _bool(v: str) -> bool:
    return v.strip().lower() == "true"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="data_profiler_for_aws_glue_data_catalog_spark",
        description="Profile every table of a database into metric "
        "statistics; publish to catalog parameters and/or Parquet.",
    )
    p.add_argument("-d", "--dbName", required=True, help="database name")
    p.add_argument(
        "-r", "--region", default="",
        help="AWS region; set to use the remote Glue catalog (needs boto3), "
        "empty = local session catalog",
    )
    p.add_argument(
        "-c", "--compExp", type=_bool, default=False,
        help="true adds the expensive frequency metrics (default false)",
    )
    p.add_argument("-p", "--statsPrefix", default="DQP")
    p.add_argument(
        "-s", "--outputPrefix", default="",
        help="metrics Parquet sink root (reference: --s3BucketPrefix); "
        "empty = no Parquet output",
    )
    p.add_argument(
        "-u", "--profileUnsupportedTypes", type=_bool, default=False,
        help="true profiles boolean/date (and timestamp) columns as text",
    )
    p.add_argument("-b", "--noOfBins", type=int, default=10)
    p.add_argument("-q", "--quantiles", type=int, default=10)
    p.add_argument(
        "--catalogJson", default="",
        help="local metadata store path for parameter publication when no "
        "--region is given; empty = skip parameter publication",
    )
    return p


def run(argv: list[str] | None = None, spark=None, glue_client=None) -> int:
    """Parse args and execute the enumerate->profile->publish lifecycle.

    ``glue_client`` injects a boto3-glue-shaped client into the
    ``--region`` path (tests use a fake; production leaves it None and
    GlueMetadataCatalog builds the real boto3 client)."""
    args = build_parser().parse_args(argv)
    config = ProfilerConfig(
        compute_expensive=args.compExp,
        stats_prefix=args.statsPrefix,
        profile_unsupported_types=args.profileUnsupportedTypes,
        profile_timestamps=args.profileUnsupportedTypes,
        n_bins=args.noOfBins,
        n_quantiles=args.quantiles,
    )

    if spark is None:
        from pyspark.sql import SparkSession

        from data_profiler_for_aws_glue_data_catalog_spark.plans.session import (
            engine_session_confs,
        )

        builder = SparkSession.builder.appName(
            "data_profiler_for_aws_glue_data_catalog_spark"
        )
        # engine perf contract, not a harness knob: fork-free local file
        # ops + long-session JVM code-cache sizing (plans/session.py);
        # graceful when the jar is absent — behavior identical, only
        # slower on fork-heavy paths
        for k, v in engine_session_confs().items():
            builder = builder.config(k, v)
        spark = builder.enableHiveSupport().getOrCreate()

    from data_profiler_for_aws_glue_data_catalog_spark.operators.profile import (
        list_catalog_tables,
        profile_table,
    )
    from data_profiler_for_aws_glue_data_catalog_spark.sinks import write_metrics_parquet
    from data_profiler_for_aws_glue_data_catalog_spark.sinks.catalog_sink import metrics_to_params

    db = args.dbName
    glue = None
    if args.region:
        from data_profiler_for_aws_glue_data_catalog_spark.sinks.glue_catalog import GlueMetadataCatalog

        from pyspark.errors import AnalysisException

        glue = GlueMetadataCatalog(client=glue_client, region=args.region)
        names = glue.list_tables(db)
        frames = {}
        for n in names:
            try:
                frames[n] = spark.table(f"{db}.{n}")
            except AnalysisException:
                # session without a Hive mapping for the Glue db (tests,
                # notebook temp views): fall back to the bare name — but
                # only when a caller injected a fake client; in production
                # a same-named temp view would silently shadow the Glue
                # table and its stats would be published back to Glue
                if glue_client is None:
                    raise
                print(
                    f"warning: {db}.{n} not resolvable in this session; "
                    f"falling back to bare table/view name {n!r}",
                    file=sys.stderr,
                )
                frames[n] = spark.table(n)
    else:
        frames = {}
        for n in list_catalog_tables(spark, db):
            t = next(t for t in spark.catalog.listTables(db) if t.name == n)
            qualified = f"{t.database}.{n}" if t.database else n
            frames[n] = spark.table(qualified)

    local_cat = None
    if args.catalogJson and not glue:
        from data_profiler_for_aws_glue_data_catalog_spark.sinks.catalog_sink import LocalMetadataCatalog

        local_cat = LocalMetadataCatalog(args.catalogJson)

    run_ts = datetime.now(timezone.utc)
    for name, df in frames.items():
        metrics = profile_table(df, config)
        if glue is not None or local_cat is not None:
            table_params, columns_params = metrics_to_params(metrics, config)
            if glue is not None:
                glue.update_table_metadata(
                    db, name, config.prefixed, table_params, columns_params
                )
            else:
                if name not in local_cat.list_tables(db):
                    local_cat.register_table(
                        db, name, [f.name for f in df.schema.fields]
                    )
                local_cat.update_table_metadata(
                    db, name, config.prefixed, table_params, columns_params
                )
        if args.outputPrefix:
            write_metrics_parquet(
                metrics, args.outputPrefix, db, table_name=name, run_ts=run_ts
            )
    return 0


if __name__ == "__main__":
    sys.exit(run())
