"""Metric-history anomaly detection unit tests (operators/anomaly.py)."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators.anomaly import detect_anomalies


def _hist(spark, rows):
    return spark.createDataFrame(
        [("Column", inst, name, v, ts) for inst, name, v, ts in rows],
        "entity string, instance string, name string, value double, "
        "profiler_run_ts string",
    )


def test_jump_flags_anomaly(spark):
    h = _hist(spark, [
        ("c", "Mean", 10.0, "2026-01-01"),
        ("c", "Mean", 12.0, "2026-01-02"),
        ("c", "Mean", 11.0, "2026-01-03"),
        ("c", "Mean", 1000.0, "2026-01-04"),
    ])
    (r,) = detect_anomalies(h).collect()
    assert r["n_runs"] == 4 and r["current"] == 1000.0
    assert r["is_anomaly"] and r["z"] > 3.0
    assert abs(r["baseline_mean"] - 11.0) < 1e-9


def test_stable_metric_not_anomalous(spark):
    h = _hist(spark, [
        ("c", "Size", 100.0, "2026-01-01"),
        ("c", "Size", 101.0, "2026-01-02"),
        ("c", "Size", 99.0, "2026-01-03"),
        ("c", "Size", 100.5, "2026-01-04"),
    ])
    (r,) = detect_anomalies(h).collect()
    assert not r["is_anomaly"]


def test_flat_baseline_exact_paths(spark):
    """Zero-variance baseline: change -> anomaly (z NULL), no change -> ok."""
    h = _hist(spark, [
        ("a", "Size", 5.0, "2026-01-01"),
        ("a", "Size", 5.0, "2026-01-02"),
        ("a", "Size", 7.0, "2026-01-03"),
        ("b", "Size", 5.0, "2026-01-01"),
        ("b", "Size", 5.0, "2026-01-02"),
        ("b", "Size", 5.0, "2026-01-03"),
    ])
    out = {r["instance"]: r for r in detect_anomalies(h).collect()}
    assert out["a"]["is_anomaly"] and out["a"]["z"] is None
    assert not out["b"]["is_anomaly"]


def test_short_baseline_never_flags(spark):
    h = _hist(spark, [
        ("c", "Mean", 1.0, "2026-01-01"),
        ("c", "Mean", 500.0, "2026-01-02"),
    ])
    (r,) = detect_anomalies(h, min_baseline_runs=2).collect()
    assert not r["is_anomaly"]


def test_one_exchange_plan(spark):
    """Window + grouped agg share one hash-partition exchange on the key."""
    h = _hist(spark, [("c", "Mean", 1.0, "2026-01-01")] * 3)
    plan = detect_anomalies(h)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_detect_changes_strategies(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.anomaly import detect_changes

    t = [dt.datetime(2026, 1, d) for d in (1, 2, 3)]
    rows = [
        # steady metric: 10 -> 10 -> 10
        ("Column", "a", "m", 10.0, t[0]),
        ("Column", "a", "m", 10.0, t[1]),
        ("Column", "a", "m", 10.0, t[2]),
        # jumping metric: 10 -> 10 -> 30 (abs +20, rate 3.0)
        ("Column", "b", "m", 10.0, t[0]),
        ("Column", "b", "m", 10.0, t[1]),
        ("Column", "b", "m", 30.0, t[2]),
        # single run: undecidable
        ("Column", "c", "m", 5.0, t[2]),
        # previous zero: rate undecidable, abs decidable
        ("Column", "d", "m", 0.0, t[1]),
        ("Column", "d", "m", 50.0, t[2]),
    ]
    hist = spark.createDataFrame(
        rows, "entity string, instance string, name string, "
        "value double, profiler_run_ts timestamp"
    )
    got = {r.instance: r for r in detect_changes(hist).collect()}
    assert got["a"].abs_change == 0.0 and not got["a"].abs_anomaly
    assert not got["a"].rel_anomaly
    assert got["b"].abs_change == 20.0 and got["b"].abs_anomaly
    assert got["b"].rel_rate == 3.0 and got["b"].rel_anomaly
    assert got["c"].previous is None
    assert not got["c"].abs_anomaly and not got["c"].rel_anomaly
    assert got["d"].rel_rate is None and not got["d"].rel_anomaly
    assert got["d"].abs_anomaly  # +50 over the abs bound


def test_changepoint_finds_injected_shift(spark):
    """A level shift at position 60/100 must be the argmax of |CUSUM|
    (within a small window; CUSUM peaks AT the change)."""
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.changepoint import mean_shift

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), "k", 10.0 if i < 60 else 20.0)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    r = mean_shift(df, "ts", "value", "event_type", "event_id").collect()[0]
    assert r["n"] == 100
    assert abs(r["shift_pos"] - 60) <= 1
    assert r["max_abs_cusum"] > 0


def test_changepoint_constant_series_is_flat(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.changepoint import mean_shift

    t0 = dt.datetime(2026, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=i), "k", 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    r = mean_shift(df, "ts", "value", "event_type", "event_id").collect()[0]
    assert r["max_abs_cusum"] == 0.0
