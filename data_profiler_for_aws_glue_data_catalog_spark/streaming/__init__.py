"""Streaming/windowed profiles (SURVEY.md §7 Phase 5).

``windowed_profile`` is the batch (``F.window``-grouped) tumbling-window
profile; ``windowed_profile_stream`` is the identical aggregation under
Structured Streaming with a watermark.
"""

from data_profiler_for_aws_glue_data_catalog_spark.streaming.windowed_profile import (
    windowed_profile,
    windowed_profile_stream,
)

__all__ = ["windowed_profile", "windowed_profile_stream"]
