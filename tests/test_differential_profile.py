"""Randomized differential test: profile_table vs its DuckDB oracle on
GENERATED tables, not just the fixed testdata (SURVEY.md §5.5).

The oracle builders in ``oracle.py`` (size/scan/freq/histogram SQL) are
composed for a hypothesis-generated 3-column table (nullable bigint,
nullable 6-dp-grid double, nullable short text) and run through DuckDB
over the same rows; every metric must agree with the Spark profile:

  - exact equality for every deterministic-decimal metric (the generated
    doubles sit on the 1e-6 grid inside the decimal domain, so both
    engines take the bit-reproducible decimal branch);
  - |diff| <= 1.1e-6 for Entropy — ROUND6 absorbs the last-ulp libm
    difference inside one 6-dp step;
  - |diff| <= 1.1e-6 + 1e-7*sqrt(m2) for StandardDeviation, where m2 is
    the column's second moment: the scale-12 squared-sum decimal exceeds
    2^53 as an integer, so DuckDB's int128->double->/1e12 cast is
    double-rounded where the JVM single-rounds, and the naive-moment
    cancellation (sx2 - sx^2/n) amplifies that ulp to ~sqrt(eps*m2) when
    the column is near-constant at high magnitude (fuzz-found:
    [1000000.0, 999999.999999] -> spark 0.0 vs duckdb 0.011). Below this
    floor the single-pass moment SD is numerical noise in ANY engine
    (the reference's double moments included) — a documented precision
    contract, not a divergence bug.

This extends the fixed-testdata gate (scripts/check_correctness.py) with
adversarial content: all-null columns, empty tables, duplicate-heavy and
unicode text, negative/zero/boundary numerics.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark import ProfilerConfig, profile_table
from data_profiler_for_aws_glue_data_catalog_spark import oracle as orc

import pytest

# generated-table differential fuzz (~40 s): fuzz machinery, soak lane
pytestmark = pytest.mark.soak


# 6-dp grid doubles within |x| <= 1e6: inside the two-sided decimal domain
# (1e-3 floor never binds: grid points below it are exact multiples of 1e-6,
# and the guard only reroutes columns, identically in both engines).
_grid = st.integers(min_value=-(10**12), max_value=10**12).map(lambda n: n / 1e6)
_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-(10**9), max_value=10**9)),
        st.one_of(st.none(), _grid),
        st.one_of(st.none(), st.text(alphabet="abπ 0", max_size=4)),
    ),
    min_size=0,
    max_size=40,
)

_ROUNDED = ("Entropy", "StandardDeviation")


def _spark_profile(spark, rows):
    df = spark.createDataFrame(rows, "i bigint, x double, s string")
    m = profile_table(df, ProfilerConfig(compute_expensive=True), include_approx=False)
    # same 6-dp finishing the registration layer applies (__spark_entry__)
    m = m.withColumn(
        "value",
        F.when(F.col("name").isin(*_ROUNDED), F.round(F.col("value"), 6)).otherwise(
            F.col("value")
        ),
    )
    return {(r["instance"], r["name"]): r["value"] for r in m.collect()}


def _oracle_profile(rows):
    pdf = pd.DataFrame(
        {
            "i": pd.array([r[0] for r in rows], dtype="Int64"),
            "x": pd.array([r[1] for r in rows], dtype="Float64"),
            "s": pd.array([r[2] for r in rows], dtype="string"),
        }
    )
    con = duckdb.connect()
    con.register("t", pdf)
    parts = [orc.size_sql("t")]
    parts += orc.scan_metric_rows("t", "i", orc.NUM, "bigint")
    parts += orc.scan_metric_rows("t", "x", orc.NUM, "double")
    parts += orc.scan_metric_rows("t", "s", orc.TEXT, "string")
    parts.append(f"SELECT * FROM ({orc.freq_metrics_sql('t', 's', 'string')})")
    parts.append(f"SELECT * FROM ({orc.histogram_sql('t', 's', 'string', 10)})")
    sql = "\nUNION ALL\n".join(f"SELECT * FROM ({p})" for p in parts)
    out = con.execute(sql).df()
    con.close()
    return {
        (r.instance, r.name): (None if pd.isna(r.value) else float(r.value))
        for r in out.itertuples()
    }


_conv_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.booleans()),
        st.one_of(st.none(), st.dates(min_value=dt.date(2020, 1, 1),
                                      max_value=dt.date(2026, 12, 31))),
    ),
    min_size=0,
    max_size=30,
)


# CI default keeps the suite fast; a soak run multiplies examples:
#   SPARK_GRAFT_DIFF_EXAMPLES=200 pytest tests/test_differential_profile.py
# Unset/empty -> per-test CI defaults (8/10). An explicit value — including
# 0, which Hypothesis rejects anyway — is honored as given; a non-integer
# fails with a message naming the env var instead of a bare ValueError.
def _examples_override() -> int | None:
    raw = os.environ.get("SPARK_GRAFT_DIFF_EXAMPLES", "").strip()
    if not raw:
        return None
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"SPARK_GRAFT_DIFF_EXAMPLES must be an integer, got {raw!r}"
        ) from None


_EXAMPLES = _examples_override()


@settings(
    max_examples=_EXAMPLES if _EXAMPLES is not None else 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_conv_rows)
def test_convert_path_matches_oracle(spark, rows):
    """boolean/date columns profile through the string-convert sweep
    (types.cast_convertibles); the oracle casts the same columns to
    VARCHAR — both engines render 'true'/'false' and ISO dates, so every
    text metric (lengths, freq family, histogram) must agree exactly."""
    df = spark.createDataFrame(rows, "b boolean, d date")
    cfg = ProfilerConfig(compute_expensive=True, profile_unsupported_types=True)
    m = profile_table(df, cfg, include_approx=False)
    m = m.withColumn(
        "value",
        F.when(F.col("name").isin(*_ROUNDED), F.round(F.col("value"), 6)).otherwise(
            F.col("value")
        ),
    )
    got = {(r["instance"], r["name"]): r["value"] for r in m.collect()}

    pdf = pd.DataFrame(
        {
            "b": pd.array([r[0] for r in rows], dtype="boolean"),
            "d": pd.Series([r[1] for r in rows], dtype="object"),
        }
    )
    con = duckdb.connect()
    con.register("raw", pdf)
    con.execute(
        "CREATE VIEW t AS SELECT CAST(b AS VARCHAR) AS b, "
        "CAST(CAST(d AS DATE) AS VARCHAR) AS d FROM raw"
    )
    parts = [orc.size_sql("t")]
    for c in ("b", "d"):
        parts += orc.scan_metric_rows("t", c, orc.TEXT, "string")
        parts.append(f"SELECT * FROM ({orc.freq_metrics_sql('t', c, 'string')})")
        parts.append(f"SELECT * FROM ({orc.histogram_sql('t', c, 'string', 10)})")
    sql = "\nUNION ALL\n".join(f"SELECT * FROM ({p})" for p in parts)
    out = con.execute(sql).df()
    con.close()
    want = {
        (r.instance, r.name): (None if pd.isna(r.value) else float(r.value))
        for r in out.itertuples()
    }
    assert set(got) == set(want), (
        f"only-spark={sorted(set(got) - set(want))[:5]} "
        f"only-oracle={sorted(set(want) - set(got))[:5]}"
    )
    for key in sorted(want):
        g, w = got[key], want[key]
        if g is None or w is None:
            assert g is None and w is None, f"{key}: spark={g} oracle={w}"
        elif key[1] == "Entropy":
            assert abs(g - w) <= 1.1e-6, f"{key}: spark={g} oracle={w}"
        else:
            assert g == w, f"{key}: spark={g!r} oracle={w!r}"


def test_sd_cancellation_floor_documented(spark):
    # The fuzz-found divergence case, pinned: near-constant at magnitude
    # 1e6, true SD 5e-7. Both engines emit noise below sqrt(eps*m2)~0.03;
    # the test asserts the divergence stays inside the documented floor.
    rows = [(None, 1000000.0, None), (None, 999999.999999, None)]
    g = _spark_profile(spark, rows)[("x", "StandardDeviation")]
    w = _oracle_profile(rows)[("x", "StandardDeviation")]
    assert abs(g - w) <= _sd_tol(rows, 1)


def _sd_tol(rows, col_idx):
    # cancellation floor of the cross-engine SD agreement (see module doc)
    sq = [v * v for r in rows if (v := r[col_idx]) is not None]
    m2 = sum(sq) / len(sq) if sq else 0.0
    return 1.1e-6 + 1e-7 * m2**0.5


@settings(
    max_examples=_EXAMPLES if _EXAMPLES is not None else 10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_profile_matches_oracle_on_generated_tables(spark, rows):
    got = _spark_profile(spark, rows)
    want = _oracle_profile(rows)
    assert set(got) == set(want), (
        f"metric key sets differ: only-spark={sorted(set(got) - set(want))[:5]} "
        f"only-oracle={sorted(set(want) - set(got))[:5]}"
    )
    tol = {"Entropy": lambda inst: 1.1e-6,
           "StandardDeviation": lambda inst: _sd_tol(rows, 0 if inst == "i" else 1)}
    for key in sorted(want):
        g, w = got[key], want[key]
        if g is None or w is None:
            assert g is None and w is None, f"{key}: spark={g} oracle={w}"
        elif key[1] in tol:
            t = tol[key[1]](key[0])
            assert abs(g - w) <= t, f"{key}: spark={g} oracle={w} tol={t}"
        else:
            assert g == w, f"{key}: spark={g!r} oracle={w!r}"
