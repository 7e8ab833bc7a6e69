from __future__ import annotations

import datetime as dt

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import funnel as FN

T0 = dt.datetime(2026, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), t) for u, s, t in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


STEPS = ["view", "click", "purchase"]


def _stages(spark, rows):
    return {
        r.entity_id: r.stages_reached
        for r in FN.funnel(_ev(spark, rows), STEPS).collect()
    }


def test_full_funnel_in_order(spark):
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")]
    assert _stages(spark, rows) == {1: 3}


def test_out_of_order_does_not_count(spark):
    # purchase before click: funnel stops at click
    rows = [(1, 0, "view"), (1, 5, "purchase"), (1, 10, "click")]
    assert _stages(spark, rows) == {1: 2}


def test_strictly_after_ties_do_not_advance(spark):
    rows = [(1, 0, "view"), (1, 0, "click")]  # same second
    assert _stages(spark, rows) == {1: 1}


def test_first_match_semantics(spark):
    # click at t=5 (before first view at t=10) doesn't count;
    # the later click at t=20 does
    rows = [(1, 5, "click"), (1, 10, "view"), (1, 20, "click")]
    assert _stages(spark, rows) == {1: 2}


def test_entity_without_step_one(spark):
    rows = [(1, 0, "click"), (2, 0, "view")]
    assert _stages(spark, rows) == {1: 0, 2: 1}


def test_summary_counts_and_conversion(spark):
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (2, 0, "view"), (2, 1, "click"),
        (3, 0, "view"),
        (4, 0, "error"),
    ]
    got = {
        r.stage: (r.n_entities, r.conversion)
        for r in FN.funnel_summary(_ev(spark, rows), STEPS).collect()
    }
    assert got[1] == (3, pytest.approx(0.75))
    assert got[2] == (2, pytest.approx(0.5))
    assert got[3] == (1, pytest.approx(0.25))


def test_one_shuffle(spark, lineitem):
    df = _ev(spark, [(i % 5, i, "view") for i in range(100)])
    plan = FN.funnel(df, STEPS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_step_times_values(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.funnel import funnel_step_times

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: view -> click (+60s) -> purchase (+120s)
        (1, t0, 1, "view"), (2, t0 + dt.timedelta(seconds=60), 1, "click"),
        (3, t0 + dt.timedelta(seconds=180), 1, "purchase"),
        # user 2: view -> click (+100s), no purchase
        (4, t0, 2, "view"), (5, t0 + dt.timedelta(seconds=100), 2, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["step"]: r for r in
           funnel_step_times(df, ["view", "click", "purchase"]).collect()}
    assert out[2]["n_entities"] == 2 and out[2]["stage"] == "click"
    assert out[2]["median_gap_s"] == 80.0  # median of {60, 100}
    assert out[3]["n_entities"] == 1 and out[3]["median_gap_s"] == 120.0


def test_funnel_step_times_partial_entities(spark):
    """Entities completing <2 steps (0 or 1) must not crash the gap
    transform — sequence(2, size) descends below 1 when size < 2
    (the r2 ADVICE crash) — and contribute no gap rows."""
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.funnel import funnel_step_times

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1 completes the full funnel
        (1, t0, 1, "view"), (2, t0 + dt.timedelta(seconds=30), 1, "click"),
        (3, t0 + dt.timedelta(seconds=90), 1, "purchase"),
        # user 2: only step 1 (size(arr) == 1 — the crash path)
        (4, t0, 2, "view"),
        # user 3: zero funnel steps (size(arr) == 0)
        (5, t0, 3, "error"),
        # user 4: step 2 only, never step 1 -> zero steps reached
        (6, t0, 4, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["step"]: r for r in
           funnel_step_times(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {2, 3}
    assert out[2]["n_entities"] == 1 and out[2]["median_gap_s"] == 30.0
    assert out[3]["n_entities"] == 1 and out[3]["median_gap_s"] == 60.0


def test_funnel_step_times_no_completers(spark):
    """All entities stop at step 1 -> empty result, no crash."""
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.funnel import funnel_step_times

    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, 1, "view"), (2, t0, 2, "view")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    assert funnel_step_times(df, ["view", "click", "purchase"]).count() == 0
