"""Property-based metric invariants (SURVEY.md §5.4).

Hypothesis generates adversarial little tables (nulls, empties, dup-heavy,
unicode); every profile must satisfy the metric algebra regardless of
content:

    Completeness ∈ [0,1]
    Uniqueness <= UniqueValueRatio, both ∈ [0,1]
    Distinctness ∈ (0,1] when any non-null value exists
    0 <= Entropy <= ln(CountDistinct) (+ rounding slack)
    MinLength <= MaxLength
    Minimum <= Mean <= Maximum (±5e-7 6-dp rounding slack), StandardDeviation >= 0
    Sum == mean * non-null count (6-dp decimal arithmetic)
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_profiler_for_aws_glue_data_catalog_spark import ProfilerConfig, profile_table

_EXP = ProfilerConfig(compute_expensive=True)

_text = st.one_of(st.none(), st.text(max_size=6))
_num = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
)
_rows = st.lists(st.tuples(_text, _num), min_size=0, max_size=25)


def _profile(spark, rows):
    df = spark.createDataFrame(rows, "s string, x double")
    m = profile_table(df, _EXP, include_approx=False)
    return {
        (r["instance"], r["name"]): r["value"]
        for r in m.collect()
        if not r["name"].startswith("Histogram")
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_metric_invariants(spark, rows):
    m = _profile(spark, rows)
    n_rows = len(rows)
    assert m[("*", "Size")] == float(n_rows)

    texts = [s for s, _ in rows if s is not None]
    nums = [x for _, x in rows if x is not None]

    comp_s, comp_x = m[("s", "Completeness")], m[("x", "Completeness")]
    if n_rows == 0:
        assert comp_s is None and comp_x is None
    else:
        assert 0.0 <= comp_s <= 1.0 and 0.0 <= comp_x <= 1.0
        assert comp_s == len(texts) / n_rows
        assert comp_x == len(nums) / n_rows

    if texts:
        assert m[("s", "MinLength")] <= m[("s", "MaxLength")]
        d, u, uvr = (
            m[("s", "Distinctness")],
            m[("s", "Uniqueness")],
            m[("s", "UniqueValueRatio")],
        )
        cd, ent = m[("s", "CountDistinct")], m[("s", "Entropy")]
        assert 0.0 < d <= 1.0
        assert 0.0 <= u <= uvr <= 1.0
        assert cd == float(len(set(texts)))
        assert d == cd / len(texts)
        assert -1e-9 <= ent <= math.log(cd) + 1e-6
    if nums:
        mn, mx, mean = m[("x", "Minimum")], m[("x", "Maximum")], m[("x", "Mean")]
        sd, total = m[("x", "StandardDeviation")], m[("x", "Sum")]
        # Decimal-deterministic Mean rounds inputs to 6 dp, so it can sit up
        # to 5e-7 outside the exact [min, max] hull (columns entirely below
        # the 1e-3 resolution floor take the IEEE branch and are exact).
        assert mn - 5e-7 <= mean <= mx + 5e-7 or math.isclose(mn, mx)
        assert sd >= 0.0
        # exact 6-dp decimal arithmetic: Sum == Mean * count
        assert math.isclose(total, mean * len(nums), rel_tol=0, abs_tol=1e-6)


# --- round-2 extension operator invariants ------------------------------

_num_pair_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.floats(min_value=-1e5, max_value=1e5,
                                       allow_nan=False, width=32)),
        st.one_of(st.none(), st.floats(min_value=-1e5, max_value=1e5,
                                       allow_nan=False, width=32)),
    ),
    min_size=0, max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_num_pair_rows)
def test_correlation_invariants(spark, rows):
    """corr ∈ [-1, 1] (+6-dp slack) or NULL; n_pairs == pairwise-complete
    count; corr(a,a-shaped pair) respects symmetry of the moments."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.correlation import correlation_matrix

    df = spark.createDataFrame(rows, "a double, b double")
    (r,) = correlation_matrix(df, ["a", "b"]).collect()
    expect_n = sum(1 for a, b in rows if a is not None and b is not None)
    assert r["n_pairs"] == expect_n
    if r["corr"] is not None:
        assert -1.000001 <= r["corr"] <= 1.000001


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(
    st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6,
                                   allow_nan=False, width=32)),
    min_size=0, max_size=30,
))
def test_numeric_histogram_invariants(spark, rows):
    """Counts sum to the non-null count; ratios to 1; bounds ordered and
    buckets within range — for any content including all-null/empty."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.numeric_histogram import (
        numeric_histograms,
    )

    df = spark.createDataFrame([(v,) for v in rows], "v double")
    out = numeric_histograms(df, ["v"], n_bins=5).collect()
    non_null = [v for v in rows if v is not None]
    assert sum(r["cnt"] for r in out) == len(non_null)
    if non_null:
        assert abs(sum(r["ratio"] for r in out) - 1.0) < 1e-6
        for r in out:
            assert 0 <= r["bucket"] < 5
            assert r["lo"] <= r["hi"] + 1e-9
    else:
        assert out == []


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", None]),
              st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                             allow_nan=False, width=32))),
    min_size=0, max_size=20,
))
def test_grouped_profile_partitions_the_table(spark, rows):
    """Per-segment Sizes partition the row count, and each segment's
    Completeness stays in [0,1]."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.grouped_profile import grouped_profile

    df = spark.createDataFrame(rows, "seg string, v double")
    out = grouped_profile(df, "seg").collect()
    sizes = {r["group_value"]: r["value"] for r in out if r["name"] == "Size"}
    assert sum(sizes.values()) == len(rows)
    for r in out:
        if r["name"] == "Completeness" and r["value"] is not None:
            assert 0.0 <= r["value"] <= 1.0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),
        st.sampled_from(["x", "y", None]),
    ),
    min_size=2, max_size=25,
))
def test_fd_and_cramers_bounds(spark, rows):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.association import cramers_v
    from data_profiler_for_aws_glue_data_catalog_spark.operators.fd import fd_strength

    df = spark.createDataFrame(rows, "d string, v string")
    for r in fd_strength(df, "d", ["v"]).collect():
        assert 0.0 <= r.group_strength <= 1.0
        assert 0.0 <= r.row_strength <= 1.0
        assert r.n_determined_groups <= r.n_groups
        assert r.n_determined_rows <= r.n_rows
    both = [t for t in rows if t[0] is not None and t[1] is not None]
    n_d = len({t[0] for t in both})
    n_v = len({t[1] for t in both})
    if both and n_d >= 2 and n_v >= 2:
        r = cramers_v(df, "d", "v").collect()[0]
        assert -1e-6 <= r.cramers_v <= 1.0 + 1e-6
        assert r.chi2 >= -1e-6
        assert r.n_rows == len(both)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(
    st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, width=32),
    min_size=4, max_size=30,
))
def test_outlier_and_winsorize_invariants(spark, rows):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.outliers import iqr_outliers, winsorize

    df = spark.createDataFrame([(float(v),) for v in rows], "x double")
    r = iqr_outliers(df, ["x"]).collect()[0]
    assert r.n_values == len(rows)
    assert r.n_outliers == r.n_below + r.n_above
    assert r.lower_fence <= r.upper_fence
    assert 0.0 <= r.outlier_rate <= 1.0
    clipped = [row.x for row in winsorize(df, ["x"], 0.1, 0.9).collect()]
    assert len(clipped) == len(rows)
    # clip bounds lie within the raw range (rounding tolerance)
    assert min(clipped) >= min(rows) - 1e-6
    assert max(clipped) <= max(rows) + 1e-6


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["p", "q", "r"])),
    min_size=1, max_size=30,
))
def test_transition_matrix_probabilities(spark, rows):
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.transitions import transition_matrix

    ev = spark.createDataFrame(
        [
            (i, dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i), u, s)
            for i, (u, s) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    got = transition_matrix(ev).collect()
    by_from = {}
    for r in got:
        assert r.n_transitions <= r.n_from_total
        assert 0.0 < r.probability <= 1.0
        by_from.setdefault(r.from_state, 0.0)
        by_from[r.from_state] += r.probability
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4
