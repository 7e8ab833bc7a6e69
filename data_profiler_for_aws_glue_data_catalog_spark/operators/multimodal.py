"""Multimodal (binary) column support.

The reference silently skips non-scalar columns (no else-branch at
Main.scala:286-292); here binary columns — images, audio, video payloads —
are first-class:

- **Profiling** (:func:`binary_scan_metrics`): Completeness plus byte-size
  Size/Min/Max/Mean/Sum metrics into the standard long metrics relation.
  All JVM-side (``F.length`` on binary is bytes), fused like the scan pass.
- **Dedup keys** (:func:`binary_fingerprints`): md5 content digest +
  byte length per row — the exact-dedup join key for opaque payloads.
  Map-side, no Python.
- **Decode / feature extraction** (:func:`decode_features`): the Python
  boundary, done the only way that scales — ``mapInPandas`` over Arrow
  batches, never a row-at-a-time UDF. The actual codec is pluggable:

  * ``decoder="fake"`` (default): deterministic dimensions/stats derived
    from the payload bytes — NO real image/audio libs in this environment,
    so this stands in for the codec while keeping every Spark-side piece
    (schema contract, Arrow batching, partition-parallelism) real and
    testable. Clearly a stand-in: see :func:`_fake_decode`.
  * ``decoder="pillow"``: decodes with PIL if importable, else raises
    ``NotImplementedError`` at plan-build time (import-gated; this
    container has no imaging libraries).

Scale notes (100 TB)
--------------------
Binary payloads dominate row size; the rules that matter:

- never ``collect`` payloads; fingerprint/profile map-side and join on the
  digest, not the bytes;
- Arrow batch size is payload-aware: tune
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 64) when rows
  carry multi-MB media so a batch stays in executor memory;
- decode emits FEATURES (small), payloads are dropped before any shuffle —
  the decode stage is a projection, shuffles only ever see the extracted
  columns.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import (
    METRIC_COLS,
    metric_struct,
)

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = (
    "id bigint, width int, height int, channels int, n_bytes bigint, "
    "mean_byte double"
)


def binary_scan_metrics(df: DataFrame, column: str) -> DataFrame:
    """Byte-size metrics of one binary column, in the long metrics relation.

    One fused agg over ``length`` (bytes for BinaryType) — same shape as a
    scan_metrics numeric batch; composable via unionByName.
    """
    col = F.col(column)
    n_bytes = F.length(col)
    row = df.agg(
        F.try_divide(F.count(col), F.count(F.lit(1))).alias("m1"),
        F.max(n_bytes).cast("double").alias("m2"),
        F.min(n_bytes).cast("double").alias("m3"),
        F.try_divide(F.sum(n_bytes), F.count(col)).alias("m4"),
        F.sum(n_bytes).cast("double").alias("m5"),
    )
    structs = [
        metric_struct("Column", column, "Completeness", F.col("m1"), "binary"),
        metric_struct("Column", column, "MaxByteLength", F.col("m2"), "binary"),
        metric_struct("Column", column, "MinByteLength", F.col("m3"), "binary"),
        metric_struct("Column", column, "MeanByteLength", F.col("m4"), "binary"),
        metric_struct("Column", column, "SumBytes", F.col("m5"), "binary"),
    ]
    return row.select(F.explode(F.array(*structs)).alias("kv")).select(
        "kv.*"
    ).select(*METRIC_COLS)


def binary_fingerprints(
    df: DataFrame, id_col: str, column: str
) -> DataFrame:
    """(id, digest, n_bytes) — the exact-dedup key for opaque payloads.

    md5 on the raw bytes, JVM-side; the (digest, n_bytes) pair is the join
    key so a dedup shuffle moves ~40 bytes/row, never the payload.
    """
    col = F.col(column)
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(col).alias("digest"),
        F.length(col).cast("bigint").alias("n_bytes"),
    )


def binary_duplicate_groups(
    df: DataFrame, id_col: str, column: str
) -> DataFrame:
    """Exact duplicate groups over a binary column: group on the digest,
    keep groups of 2+ — one shuffle of fingerprints, payloads never move."""
    fp = binary_fingerprints(df, id_col, column)
    return (
        fp.groupBy("digest", "n_bytes")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("id").alias("keeper_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC STAND-IN for a real media codec (none installed here).

    Derives (width, height, channels, mean_byte) purely from the payload so
    tests and oracles are exact; replace with a real decoder via
    ``decoder="pillow"`` where imaging libs exist.
    """
    n = len(payload)
    width = 1 + (n % 512)
    height = 1 + ((n * 7) % 512)
    mean = (sum(payload) / n) if n else 0.0
    return width, height, 3, mean


def decode_features(
    df: DataFrame,
    id_col: str,
    column: str,
    decoder: str = "fake",
) -> DataFrame:
    """Per-payload decoded features via ``mapInPandas`` (Arrow batches).

    Output: ``(id, width, height, channels, n_bytes, mean_byte)``. The
    payload column is projected away in the same stage — downstream plans
    (joins, aggs) only ever shuffle the small feature columns.
    """
    if decoder == "pillow":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - no imaging libs here
            raise NotImplementedError(
                "decode_features(decoder='pillow') needs Pillow, which is "
                "not installed in this environment; use decoder='fake' for "
                "the deterministic stand-in"
            ) from e

    src = df.select(F.col(id_col).alias("id"), F.col(column).alias("payload"))

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            payloads = batch["payload"]
            rows = []
            for pid, payload in zip(batch["id"], payloads):
                b = bytes(payload) if payload is not None else b""
                w, h, c, mean = _fake_decode(b)
                rows.append((int(pid), w, h, c, len(b), mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "channels", "n_bytes",
                    "mean_byte",
                ],
            )

    return src.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)
