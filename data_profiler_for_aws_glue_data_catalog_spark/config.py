"""Profiler configuration.

Mirrors the reference CLI surface (CommandLineArgs.scala:21-30, defaults at
:24-29) as an immutable dataclass instead of the reference's mutable
object-level vars (DataProfilerForAWSGlueDataCatalog.scala:46-68,130-137).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ProfilerConfig:
    """Knobs for a profiling run.

    Attributes
    ----------
    compute_expensive:
        Reference ``--compExp`` (CommandLineArgs.scala:24): adds the six
        frequency-table metrics (CountDistinct, Entropy, Histogram,
        UniqueValueRatio, Uniqueness, Distinctness) on text columns.
    stats_prefix:
        Reference ``--statsPrefix`` (default ``DQP``); the catalog sink keys
        parameters ``<prefix>__<MetricName>``
        (DataProfilerForAWSGlueDataCatalog.scala:133,211).
    profile_unsupported_types:
        Reference ``--profileUnsupportedTypes``: cast boolean/date columns to
        string and profile them as text
        (DataProfilerForAWSGlueDataCatalog.scala:368-386).
    profile_timestamps:
        Extension beyond the reference (which deliberately commented
        timestamp support out, Main.scala:60-62): also cast timestamp
        columns to string when ``profile_unsupported_types`` is set.
    n_bins:
        Histogram top-k size (``--noOfBins``, default 10).
    n_quantiles:
        Number of quantiles q; computes i/q for i=1..q (``--quantiles``,
        default 10; Main.scala:335-337 includes 1.0, excludes 0.0).
    approx_distinct_rsd:
        HLL++ relative standard deviation for ApproxCountDistinct; 0.05
        matches Deequ 1.0.2's default sketch accuracy.
    quantile_accuracy:
        ``percentile_approx`` accuracy knob; 100 ~= Deequ's Greenwald-Khanna
        relativeError 0.01. Raise for tighter sketches at more memory.
    max_fused_columns_per_pass:
        Very wide tables create one aggregate expression per (column,
        metric); hundreds of columns stress whole-stage codegen. The fused
        scan pass is batched to at most this many columns per job (each
        batch is still one full-scan agg; at 100 TB, prefer fewer, wider
        batches as long as codegen holds).
    histogram_null_label:
        Label under which nulls are binned in Histogram metrics; Deequ
        1.0.2 uses the literal string ``NullValue``.
    """

    compute_expensive: bool = False
    stats_prefix: str = "DQP"
    profile_unsupported_types: bool = False
    profile_timestamps: bool = False
    n_bins: int = 10
    n_quantiles: int = 10
    approx_distinct_rsd: float = 0.05
    quantile_accuracy: int = 100
    max_fused_columns_per_pass: int = 64
    histogram_null_label: str = "NullValue"

    @property
    def prefixed(self) -> str:
        """Parameter-key prefix with the reference's ``__`` separator."""
        return f"{self.stats_prefix}__"
