"""Sinks: durable outputs of the profiling engine.

Two, mirroring the reference (SURVEY.md §2.B):

- :mod:`parquet_sink` — append-mode partitioned Parquet of the enriched
  metrics relation (Main.scala:231-252);
- :mod:`catalog_sink` — table/column parameter publication with the
  delete-then-upsert ``<prefix>__<Metric>`` contract (Glue.java:44-151),
  against a local pluggable metadata store.

Plus one scale extension past the reference:

- :mod:`bucketed` — bucketBy+sortBy external tables for co-located
  (exchange-free) joins on a pre-paid shuffle.
"""

from data_profiler_for_aws_glue_data_catalog_spark.sinks.catalog_sink import (
    LocalMetadataCatalog,
    format_metric_value,
    metrics_to_params,
    publish_profile,
)
from data_profiler_for_aws_glue_data_catalog_spark.sinks.bucketed import (
    cobucketed_join,
    register_bucketed,
    write_bucketed,
)
from data_profiler_for_aws_glue_data_catalog_spark.sinks.parquet_sink import (
    enrich_metrics,
    read_metrics_parquet,
    write_metrics_parquet,
)

__all__ = [
    "cobucketed_join",
    "register_bucketed",
    "write_bucketed",
    "LocalMetadataCatalog",
    "format_metric_value",
    "metrics_to_params",
    "publish_profile",
    "enrich_metrics",
    "read_metrics_parquet",
    "write_metrics_parquet",
]
