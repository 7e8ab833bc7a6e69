from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.streaming.enrichment import enrich_stream, upsert_writer


def _event_rows():
    return [
        (1, dt.datetime(2024, 1, 1, 10, 0), 7, "click"),
        (2, dt.datetime(2024, 1, 1, 10, 30), 8, "view"),
        (3, dt.datetime(2024, 1, 1, 11, 0), 7, "click"),
    ]


def _stream_from(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    src = str(tmp_path / f"src_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    return df, spark.readStream.schema(df.schema).parquet(src)


def test_stream_static_join(spark, tmp_path):
    df, stream = _stream_from(spark, tmp_path, _event_rows(), "enrich")
    dim = spark.createDataFrame([(7, "gold"), (9, "basic")], "user_id bigint, tier string")
    out = enrich_stream(stream, dim, on="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.event_id: r.tier for r in spark.table("enriched_t").collect()}
    assert got == {1: "gold", 3: "gold", 2: None}


def test_upsert_writer_idempotent(spark, tmp_path):
    target = str(tmp_path / "upsert_out")
    batch1 = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint")
    batch2 = spark.createDataFrame([(2, 25), (3, 30)], "k bigint, v bigint")
    w = upsert_writer(spark, target, ["k"])
    w(batch1, 0)
    w(batch2, 1)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 10, 2: 25, 3: 30}
    # replay of batch2 (failure recovery) converges to the same state
    w(batch2, 1)
    again = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert again == got


def test_upsert_with_streaming_aggregate(spark, tmp_path):
    from data_profiler_for_aws_glue_data_catalog_spark.streaming.windowed_profile import windowed_distinct_stream

    df, stream = _stream_from(spark, tmp_path, _event_rows(), "agg")
    target = str(tmp_path / "agg_out")
    agg = windowed_distinct_stream(stream, "ts", "user_id", "1 hour")
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert_writer(spark, target, ["window_start"]))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.window_start.hour: r.n_events for r in spark.read.parquet(target).collect()}
    assert got == {10: 2, 11: 1}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The streaming interval join (availableNow over a file source) must
    produce exactly the rows the equivalent BATCH interval join produces."""
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.streaming.enrichment import join_streams_interval

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    clicks = [(i, t0 + dt.timedelta(minutes=2 * i), i % 3) for i in range(10)]
    convs = [
        (100 + i, t0 + dt.timedelta(minutes=2 * i + j), i % 3)
        for i in range(10)
        for j in (1, 7)  # one inside the 5-min window, one outside
    ]
    cdf = spark.createDataFrame(clicks, "click_id long, c_ts timestamp, user_id long")
    vdf = spark.createDataFrame(convs, "conv_id long, v_ts timestamp, user_id long")
    cdir, vdir = str(tmp_path / "clicks"), str(tmp_path / "convs")
    cdf.write.parquet(cdir)
    vdf.write.parquet(vdir)
    cs = spark.readStream.schema(cdf.schema).parquet(cdir)
    vs = spark.readStream.schema(vdf.schema).parquet(vdir)

    out = join_streams_interval(cs, vs, "user_id", "c_ts", "v_ts")
    q = (
        out.writeStream.format("memory").queryName("ssj_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["conv_id"])
        for r in spark.table("ssj_t").collect()
    }

    from pyspark.sql import functions as F
    batch = cdf.join(
        vdf,
        (cdf.user_id == vdf.user_id)
        & (vdf.v_ts >= cdf.c_ts)
        & (vdf.v_ts <= cdf.c_ts + F.expr("INTERVAL 5 minutes")),
    )
    want = {(r["click_id"], r["conv_id"]) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
