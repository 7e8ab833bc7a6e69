"""PySpark-native data-profiling engine.

A from-scratch re-expression of the capabilities of
aws-samples/data-profiler-for-aws-glue-data-catalog (a Scala/Deequ column
profiler for the Glue Data Catalog) as an idiomatic PySpark engine:

- every Deequ metric the reference instantiates is computed with built-in
  Spark SQL aggregate expressions fused into at most two kinds of jobs per
  table (one scan-shared ``df.agg`` pass + one shared frequency table per
  expensive column) — see ``operators/scan_metrics.py`` and
  ``operators/frequency_metrics.py``;
- the long metrics relation ``(entity, instance, name, value, type)`` is the
  engine's output data model (reference: ``successMetricsAsDataFrame``,
  DataProfilerForAWSGlueDataCatalog.scala:297);
- sinks mirror the reference's two outputs: partitioned Parquet and a
  delete-then-upsert parameter catalog (Glue.java:38-151);
- beyond the reference surface: deduplication (exact / MinHash-LSH / SimHash
  / n-gram Jaccard / embedding-cosine) with connected-component cluster
  resolution, similarity search (exact / IVF / signed-projection LSH),
  embedding profiling/projection/quantization, text analysis, benchmark
  contamination, multimodal column plumbing, streaming + windowed profiles
  and compliance, incremental profiling over mergeable states, constraint
  verification + suggestion, rule analyzers (Compliance / PatternMatch /
  MutualInformation / DataType inference), metric-history anomaly detection
  (z-score + change strategies), PSI distribution drift, numeric histograms,
  correlation matrices, segmented/rollup profiles, key-skew diagnostics,
  candidate-key discovery, grouped quantiles, JSON payload profiling,
  rolling windows, snapshot diffs, funnels and cohort retention — designed
  for 100 TB-scale partitioned execution.
"""

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators.profile import (
    profile_database,
    profile_table,
)

__all__ = ["ProfilerConfig", "profile_table", "profile_database"]

__version__ = "0.1.0"
