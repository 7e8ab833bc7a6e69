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
