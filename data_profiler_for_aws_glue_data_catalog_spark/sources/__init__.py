from data_profiler_for_aws_glue_data_catalog_spark.sources.registry import (
    TPCH_TABLES,
    load_tables,
    read_parquet_table,
    read_table,
    register_views,
)

__all__ = [
    "TPCH_TABLES",
    "load_tables",
    "read_parquet_table",
    "read_table",
    "register_views",
]
