"""Streaming/windowed profiles + stateful dedup (SURVEY.md §7 Phase 5).

``windowed_profile`` is the batch (``F.window``-grouped) tumbling-window
profile; ``windowed_profile_stream`` is the identical aggregation under
Structured Streaming with a watermark. ``stream_exact_dedup`` /
``stream_occurrence_index`` deduplicate/annotate unbounded document
streams with watermark-bounded keyed state.
"""

from data_profiler_for_aws_glue_data_catalog_spark.streaming.stateful_dedup import (
    stream_exact_dedup,
    stream_occurrence_index,
)
from data_profiler_for_aws_glue_data_catalog_spark.streaming.windowed_profile import (
    windowed_profile,
    windowed_profile_stream,
)

__all__ = [
    "stream_exact_dedup",
    "stream_occurrence_index",
    "windowed_profile",
    "windowed_profile_stream",
]
