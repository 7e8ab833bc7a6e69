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


FRAME_SCHEMA = (
    "id bigint, frame_idx int, frame_offset bigint, frame_len int, "
    "frame_md5 string"
)


def frame_sample(
    df: DataFrame,
    id_col: str,
    column: str,
    n_frames: int = 4,
    frame_len: int = 16,
) -> DataFrame:
    """Uniform frame sampling from opaque media payloads — the video
    analog of decode_features, exercising the one-row -> many-rows
    ``mapInPandas`` shape a real frame extractor needs.

    For each payload, ``n_frames`` evenly spaced byte windows are cut at
    ``offset_i = floor(i * n_bytes / n_frames)`` and fingerprinted:
    (id, frame_idx, frame_offset, frame_len, frame_md5). With a real
    codec the byte-window slicer becomes the keyframe decoder; every
    Spark-side aspect (Arrow batches, fan-out row multiplicity, payload
    projected away before any shuffle) is identical.

    Payloads shorter than one window emit fewer/shorter frames; empty or
    NULL payloads emit no rows (mirrors explode semantics).
    """
    src = df.select(F.col(id_col).alias("id"), F.col(column).alias("payload"))

    def sample_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for batch in batches:
            rows = []
            for pid, payload in zip(batch["id"], batch["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                if n == 0:
                    continue
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    chunk = b[off : off + frame_len]
                    if not chunk:
                        continue
                    rows.append(
                        (
                            int(pid), i, off, len(chunk),
                            hashlib.md5(chunk).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "frame_idx", "frame_offset", "frame_len",
                    "frame_md5",
                ],
            )

    return src.mapInPandas(sample_batches, schema=FRAME_SCHEMA)


def frame_sample_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_frames: int = 4,
    frame_len: int = 16,
) -> str:
    """DuckDB mirror for ASCII payload fixtures (byte slicing == string
    slicing for single-byte characters, so substring reproduces the byte
    windows exactly)."""
    return f"""
WITH src AS (
  SELECT {id_col} AS id, {text_col} AS payload, length({text_col}) AS n
  FROM {table} WHERE {text_col} IS NOT NULL AND length({text_col}) > 0
),
frames AS (
  SELECT id, CAST(i AS INT) AS frame_idx,
    CAST((i * n) // {n_frames} AS BIGINT) AS frame_offset,
    substring(payload, CAST((i * n) // {n_frames} AS BIGINT) + 1, {frame_len})
      AS chunk
  FROM src, unnest(range(0, {n_frames})) AS r(i)
)
SELECT id, frame_idx, frame_offset,
  CAST(length(chunk) AS INT) AS frame_len,
  md5(chunk) AS frame_md5
FROM frames WHERE length(chunk) > 0
"""
