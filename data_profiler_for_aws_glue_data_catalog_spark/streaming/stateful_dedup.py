"""Stateful streaming deduplication over document streams.

Extends the batch dedup family (operators/dedup.py) to unbounded streams
(SURVEY.md §7 Phase 5): an ingestion pipeline that must not re-admit
content it has already seen, with state bounded by a watermark TTL.

Two operators, two state backends:

- ``stream_exact_dedup`` — the scale path. Content is keyed by
  md5(normalized text) and deduplicated with Spark's built-in
  ``dropDuplicatesWithinWatermark``: JVM-side keyed state in the state
  store (RocksDB on a real cluster), no Python in the loop. Rows whose
  key was seen within the watermark horizon are dropped; state for keys
  older than the watermark is evicted automatically, so state size is
  bounded by distinct-keys-per-horizon, not stream length.

- ``stream_occurrence_index`` — the custom-stateful demonstration the
  built-ins cannot express: every row is KEPT and annotated with its
  occurrence index within its content group (1 = first sight = the copy
  a dedup would keep; k>1 = the k-th duplicate). Implemented with
  ``applyInPandasWithState``: per content-key state (rows seen so far)
  lives in the state store; rows cross to Python as Arrow batches per
  group. Within a micro-batch a group's rows are ordered by id, so the
  assignment is deterministic for a fixed batch decomposition (the
  correctness query runs availableNow over one file = one batch, and is
  mirrored exactly by a row_number() oracle).

Scale notes (100 TB / unbounded)
--------------------------------
- Both operators shuffle once, hash-partitioned by content key — the
  same shape as batch exact dedup. Hot keys are single state entries
  (counts), not row buffers.
- The watermark TTL is the contract: duplicates farther apart than the
  horizon are NOT caught (documented recall tradeoff of any windowed
  dedup) in exchange for bounded state.
- ``applyInPandasWithState`` pays one Arrow round trip per group batch;
  keep the projected columns minimal (id + key here). The exact-dedup
  path needs no Python at all — prefer it unless per-row custom state
  logic is genuinely required.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_profiler_for_aws_glue_data_catalog_spark.functions import text as X

OCCURRENCE_SCHEMA = "id bigint, content_md5 string, occurrence int"
_STATE_SCHEMA = "seen bigint"


def _keyed(
    stream: DataFrame, text_col: str, id_col: str, ts_col: str
) -> DataFrame:
    """(id, ts, content_md5) projection — the minimal dedup-keyed stream."""
    return stream.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        X.md5_hex(X.normalized(F.col(text_col))).alias("content_md5"),
    )


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-sight-only stream: drops rows whose normalized-content hash
    was already seen within the watermark horizon.

    Built entirely from JVM-side streaming state
    (``dropDuplicatesWithinWatermark`` on the 128-bit content key); the
    watermark bounds both late-data acceptance and state retention.
    """
    return (
        _keyed(stream, text_col, id_col, ts_col)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def _occurrence_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Annotate each row of one content group with its occurrence index.

    State = total rows of this key seen in previous micro-batches. Rows
    within the current batch are ordered by id so the assignment does not
    depend on shuffle arrival order.
    """
    (content_md5,) = key
    seen = state.get[0] if state.exists else 0
    for pdf in pdfs:
        pdf = pdf.sort_values("id")
        n = len(pdf)
        yield pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "content_md5": content_md5,
                "occurrence": range(seen + 1, seen + 1 + n),
            }
        )
        seen += n
    state.update((seen,))


def stream_occurrence_index(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """(id, content_md5, occurrence) for every stream row — custom keyed
    state via ``applyInPandasWithState`` (see module docstring)."""
    return (
        _keyed(stream, text_col, id_col, ts_col)
        .withWatermark("ts", watermark)
        .groupBy("content_md5")
        .applyInPandasWithState(
            _occurrence_fn,
            OCCURRENCE_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_within_watermark(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Native bounded-state streaming dedup via
    ``dropDuplicatesWithinWatermark`` (Spark 3.5+ public API).

    Where :func:`stream_exact_dedup` keeps EVERY seen content hash in
    state forever (exact across the whole stream, unbounded state),
    this drops duplicates only within the watermark horizon — state
    evicts as event time advances, the production tradeoff for
    endless streams. Duplicates farther apart than the watermark can
    both survive (documented recall bound, not a bug).

    The dedup key is the same normalized-content hash as the exact
    path, so the two variants are interchangeable downstream.
    """
    keyed = stream.withColumn(
        "content_md5", X.md5_hex(X.normalized(F.col(text_col)))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )
