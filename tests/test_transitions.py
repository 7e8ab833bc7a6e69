from __future__ import annotations

import datetime as dt

from data_profiler_for_aws_glue_data_catalog_spark.operators import transitions as TR


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2026, 1, 1, 0, m), u, s) for i, (u, m, s) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )


def _matrix(spark, rows):
    return {
        (r.from_state, r.to_state): (r.n_transitions, r.n_from_total, r.probability)
        for r in TR.transition_matrix(_ev(spark, rows)).collect()
    }


def test_basic_transitions(spark):
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "buy"),
        (2, 0, "view"), (2, 1, "click"), (2, 2, "click"),
    ]
    got = _matrix(spark, rows)
    assert got[("view", "click")] == (2, 2, 1.0)
    n, total, p = got[("click", "buy")]
    assert (n, total) == (1, 2)  # click-origins: u1 click->buy, u2 click->click
    assert p == 0.5


def test_no_cross_user_transitions(spark):
    rows = [(1, 0, "a"), (2, 1, "b")]
    assert _matrix(spark, rows) == {}


def test_tie_break_is_deterministic(spark):
    # same timestamp: event_id ascending decides the order
    rows = [(1, 0, "a"), (1, 0, "b"), (1, 0, "c")]
    got = _matrix(spark, rows)
    assert set(got) == {("a", "b"), ("b", "c")}


def test_probabilities_sum_to_one_per_from(spark, spark_events=None):
    rows = [(1, i, s) for i, s in enumerate("abcabcaab")]
    got = TR.transition_matrix(_ev(spark, rows)).collect()
    by_from = {}
    for r in got:
        by_from.setdefault(r.from_state, 0.0)
        by_from[r.from_state] += r.probability
    assert all(abs(v - 1.0) < 1e-5 for v in by_from.values())


def test_pagerank_tiny_graph_invariants(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
         ("a", "c", 1.0), ("d", "a", 1.0)],
        "src string, dst string, weight double",
    )
    rows = pagerank(edges, iterations=10).collect()
    ranks = {r["node"]: r["rank"] for r in rows}
    assert set(ranks) == {"a", "b", "c", "d"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # mass conserved
    assert all(v > 0 for v in ranks.values())
    # d has no in-edges: floor rank; a is the hub: top rank
    assert ranks["d"] == min(ranks.values())
    assert ranks["a"] == max(ranks.values())


def test_pagerank_dangling_mass_redistributed(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.pagerank import pagerank

    # b is dangling (no out-edges): its mass must recycle, sum stays 1
    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    rows = pagerank(edges, iterations=5).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6


def test_transition_conformance_flags(spark):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.transitions import transition_conformance

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "signup"), (2, t0 + dt.timedelta(minutes=1), 1, "view"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase"),  # view->purchase illegal
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {(r["from_state"], r["to_state"]): r["allowed"]
           for r in transition_conformance(df, [("signup", "view"), ("view", "click")]).collect()}
    assert out[("signup", "view")] is True
    assert out[("view", "purchase")] is False
