from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.streaming import (
    windowed_profile,
    windowed_profile_stream,
)


def _mk_events(spark):
    # two full hourly windows + one event in a third
    rows = [
        (datetime(2024, 1, 1, 0, 10), 1.0, "a"),
        (datetime(2024, 1, 1, 0, 20), 3.0, "bb"),
        (datetime(2024, 1, 1, 1, 5), 10.0, None),
        (datetime(2024, 1, 1, 1, 55), None, "cccc"),
        (datetime(2024, 1, 1, 2, 0), 7.0, "d"),
        (None, 99.0, "ignored"),  # NULL ts -> no window
    ]
    return spark.createDataFrame(rows, "ts timestamp, v double, s string")


def _key(rows):
    return {
        (str(r["window_start"]), r["instance"], r["name"]): r["value"]
        for r in rows
    }


def test_windowed_profile_values(spark):
    df = _mk_events(spark)
    out = windowed_profile(df, "ts", "1 hour")
    m = _key(out.collect())
    w0 = "2024-01-01 00:00:00"
    w1 = "2024-01-01 01:00:00"
    w2 = "2024-01-01 02:00:00"
    assert m[(w0, "*", "Size")] == 2.0
    assert m[(w1, "*", "Size")] == 2.0
    assert m[(w2, "*", "Size")] == 1.0
    # NULL-ts row contributes to no window
    assert sum(v for (ws, i, n), v in m.items() if n == "Size") == 5.0
    assert m[(w0, "v", "Sum")] == 4.0
    assert m[(w0, "v", "Mean")] == 2.0
    assert abs(m[(w0, "v", "StandardDeviation")] - 1.0) < 1e-12
    assert m[(w1, "v", "Completeness")] == 0.5
    assert m[(w1, "v", "Sum")] == 10.0
    assert m[(w1, "v", "StandardDeviation")] == 0.0
    assert m[(w0, "s", "MaxLength")] == 2.0
    assert m[(w0, "s", "MinLength")] == 1.0
    assert m[(w1, "s", "MaxLength")] == 4.0
    # window bounds are duration apart
    r = out.where(F.col("instance") == "*").select(
        "window_start", "window_end"
    ).first()
    assert (r["window_end"] - r["window_start"]).total_seconds() == 3600


def test_windowed_profile_one_shuffle(spark):
    df = _mk_events(spark)
    plan = windowed_profile(df, "ts", "1 hour")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_windowed_profile_approx_distinct(spark):
    df = _mk_events(spark)
    m = _key(windowed_profile(df, "ts", "1 hour", approx_distinct=True).collect())
    # exact small cardinalities: HLL++ is exact at these sizes
    assert m[("2024-01-01 00:00:00", "v", "ApproxCountDistinct")] == 2.0
    assert m[("2024-01-01 01:00:00", "s", "ApproxCountDistinct")] == 1.0


def test_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    df = _mk_events(spark).where(F.col("ts").isNotNull())
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    windowed = windowed_profile_stream(
        stream, "ts", "1 hour", watermark="0 seconds"
    )
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_profile")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _key(spark.table("win_profile").collect())

    batch = _key(windowed_profile(df, "ts", "1 hour").collect())
    # append mode finalizes every window whose end <= watermark (= max event
    # time); the window containing the max event stays open and unemitted
    open_ws = "2024-01-01 02:00:00"
    expect = {k: v for k, v in batch.items() if k[0] != open_ws}
    assert set(got) == set(expect)
    for k, v in expect.items():
        if v is None or got[k] is None:
            assert v == got[k], k
        else:
            assert math.isclose(v, got[k], rel_tol=1e-12), (k, v, got[k])
