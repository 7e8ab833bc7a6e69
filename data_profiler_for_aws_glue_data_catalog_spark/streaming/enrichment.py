"""Streaming enrichment and idempotent publication.

Two standard Structured Streaming building blocks the profiler's
streaming surface needs around its windowed aggregations:

1. **Stream-static join** (`enrich_stream`): join a stream against a
   static dimension. Spark re-plans the static side per micro-batch, so
   a broadcast hint keeps the join map-side — the streaming analog of
   the engine's broadcast-dim discipline. No watermark is needed
   (stateless join against static data).

2. **foreachBatch keyed upsert** (`upsert_writer`): idempotent
   publication of update-mode aggregates to a Parquet directory —
   delete-then-insert by key per micro-batch, the same
   delete-then-upsert contract as the catalog sink (Glue.java:109-131),
   but for streaming results. Re-delivered micro-batches (failure
   replay) converge to the same state because the upsert is keyed, not
   append-only.

Scale notes (100 TB / production): the upsert rewrites the whole
target per batch — right for SMALL aggregate outputs (windowed metric
relations, top-k tables). For large targets swap the body for a
Delta/Iceberg MERGE; the foreachBatch wiring is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static equi-join with the static side broadcast."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def upsert_writer(spark: SparkSession, target_dir: str, key_cols: list[str]):
    """Returns a ``foreachBatch`` function that upserts each micro-batch
    into ``target_dir`` by ``key_cols`` (delete-then-insert semantics).

    Usage::

        q = (agg_stream.writeStream.outputMode("update")
             .foreachBatch(upsert_writer(spark, out, ["window_start"]))
             .trigger(availableNow=True).start())
    """

    def _upsert(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        batch = batch.dropDuplicates(key_cols)
        try:
            existing = spark.read.parquet(target_dir)
            merged = existing.join(
                F.broadcast(batch.select(*key_cols).distinct()),
                on=key_cols,
                how="left_anti",
            ).unionByName(batch)
        except Exception:
            merged = batch
        # localCheckpoint truncates lineage so the overwrite below cannot
        # re-read the files it is replacing (persist alone could evict and
        # recompute from the deleted source). Durability beyond this is a
        # transactional table format's job.
        merged = merged.localCheckpoint(eager=True)
        merged.coalesce(1).write.mode("overwrite").parquet(target_dir)

    return _upsert


def join_streams_interval(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str = "5 minutes",
    max_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-STREAM inner join: right-side rows within
    ``[left_ts, left_ts + window]`` for the same key (click->conversion
    attribution, request->response pairing).

    Both sides carry a watermark and the join condition bounds event time
    in BOTH directions — the two requirements Structured Streaming
    imposes so it can expire buffered state: each side holds only rows
    younger than watermark + window, giving bounded state at any input
    rate (the unbounded-state stream join is rejected by Spark at
    analysis time). Output appears once the watermark passes the join
    window — the throughput/latency trade every stream-stream join makes.

    ``left_ts``/``right_ts`` must be distinct names (rename upstream);
    the key column is emitted once. At 100 TB the join state is
    hash-partitioned by key like any equi-join — hot keys shard across
    time via the interval bound.
    """
    l = left.withWatermark(left_ts, max_delay).alias("l")
    r = right.withWatermark(right_ts, max_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window}")
        )
    )
    right_cols = [c for c in right.columns if c != key]
    return l.join(r, cond, "inner").select(
        "l.*", *[F.col(f"r.{c}") for c in right_cols]
    )
