from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import (
    METRICS_SCHEMA,
    empty_metrics,
)

__all__ = ["METRICS_SCHEMA", "empty_metrics"]
