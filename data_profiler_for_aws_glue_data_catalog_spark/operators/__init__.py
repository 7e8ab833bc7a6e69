from data_profiler_for_aws_glue_data_catalog_spark.operators.profile import (
    profile_database,
    profile_table,
)

__all__ = ["profile_table", "profile_database"]
