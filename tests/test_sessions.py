"""Sessionization: boundary semantics, batch/aggregate agreement, and
streaming equivalence."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.sessions import (
    session_stats,
    session_stats_stream,
    sessionize,
)


def _events(spark):
    rows = [
        # user 1: three events, gaps 1h exactly then 1h+1s -> sessions 1,1,2
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, 1, datetime(2024, 1, 1, 1, 0, 0), 2.0),
        (3, 1, datetime(2024, 1, 1, 2, 0, 1), 4.0),
        # user 2: single event
        (4, 2, datetime(2024, 1, 1, 5, 0, 0), 8.0),
        # user 2: same timestamp as event 4 -> same session, id tie-break
        (5, 2, datetime(2024, 1, 1, 5, 0, 0), 16.0),
        # unassignable rows: null ts / null user
        (6, 3, None, 32.0),
        (7, None, datetime(2024, 1, 1, 6, 0, 0), 64.0),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )


def test_sessionize_boundaries(spark):
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(_events(spark), gap="1 hour").collect()
    }
    # exact-gap event stays in session 1 (matches F.session_window: merge
    # when gap == threshold, split when gap > threshold)
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_session_stats_matches_sessionize_aggregation(spark):
    ev = _events(spark)
    stats = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in session_stats(ev, gap="1 hour").collect()
    }
    assert stats == {
        (1, datetime(2024, 1, 1, 0, 0, 0)): (2, 3.0),
        (1, datetime(2024, 1, 1, 2, 0, 1)): (1, 4.0),
        (2, datetime(2024, 1, 1, 5, 0, 0)): (2, 24.0),
    }
    # session_end = last event + gap
    ends = {
        (r["user_id"], r["session_start"]): r["session_end"]
        for r in session_stats(ev, gap="1 hour").collect()
    }
    assert ends[(1, datetime(2024, 1, 1, 0, 0, 0))] == datetime(2024, 1, 1, 2, 0, 0)


def test_session_stats_stream_matches_batch(spark, tmp_path):
    ev = _events(spark).where(F.col("ts").isNotNull())
    src = str(tmp_path / "sess_src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)

    q = (
        session_stats_stream(stream, gap="1 hour", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = {tuple(r) for r in session_stats(ev, gap="1 hour").collect()}
    streamed = {tuple(r) for r in spark.table("sess_out").collect()}
    # append mode only emits sessions the watermark has passed; with
    # availableNow + 0s watermark every session but the latest finalizes
    assert streamed <= batch
    assert len(streamed) >= len(batch) - 1


def test_interarrival_stats(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.interarrival import interarrival_stats

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 7),
        (2, dt.datetime(2024, 1, 1, 0, 0, 10), 7),
        (3, dt.datetime(2024, 1, 1, 0, 0, 40), 7),
        (4, dt.datetime(2024, 1, 1, 0, 0, 5), 8),
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, user_id bigint")
    r = interarrival_stats(ev).collect()[0]
    assert r.n_gaps == 2  # user 7 has two gaps; user 8 has none
    assert (r.min_gap_s, r.max_gap_s) == (10, 30)
    assert r.mean_gap_s == 20.0
