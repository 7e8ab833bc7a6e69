"""Cross-engine percentile-edge parity: oracle.spark_percentile_edges_select
must be BIT-IDENTICAL to Spark ``percentile(col, array(...))``.

Why this exists: DuckDB ``quantile_cont`` computes the symmetric type-7
interpolation unconditionally; Spark's Percentile short-circuits
``if (higherKey == lowerKey) return lowerKey`` when both bracketing order
statistics are the same repeated value k.  ``k*(hi-pos) + k*(pos-lo)``
can round 1 ulp below k, and when the edge is used as a raw ``>``
set-membership boundary (curriculum bands, calibration buckets) every
row sitting exactly at k flips sides — observed at sf0.1 as a 2488-cell
curriculum_documents mismatch before the helper landed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from data_profiler_for_aws_glue_data_catalog_spark.oracle import spark_percentile_edges_select

PROBS = [i / 10 for i in range(1, 10)] + [0.25, 0.75, 0.99]


def _spark_edges(spark, vals, probs):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    arr = ", ".join(repr(p) for p in probs)
    return df.selectExpr(f"percentile(v, array({arr})) AS e").first()["e"]


def _oracle_edges(vals, probs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS v", [list(map(float, vals))])
    sql = spark_percentile_edges_select("t", "v", probs)
    return con.sql(sql).fetchone()[0]


def _bits(x: float) -> int:
    import struct

    return struct.unpack(">q", struct.pack(">d", x))[0]


# The k=0.1 block is sized so several decile positions land strictly
# inside the repeated run: the shortcut case that diverges from
# quantile_cont.  The irrational-ish tail exercises the interpolating
# branch with fractional positions.
REPEATED = [0.1] * 37 + [math.sqrt(i) / 7 for i in range(2, 41)]


@pytest.mark.parametrize(
    "vals",
    [
        REPEATED,
        [1.0],
        [3.5, -2.25],
        [float(i) for i in range(10)],
        [0.1] * 5 + [0.2] * 5,
        [1e300, 1e-300, 2.5e300, 3.0, -1e300],
        [math.pi / i for i in range(1, 50)],
    ],
    ids=["repeated-run", "single", "pair", "ints", "two-blocks", "extreme", "pi-harmonics"],
)
def test_edges_bit_identical(spark, vals):
    s = _spark_edges(spark, vals, PROBS)
    o = _oracle_edges(vals, PROBS)
    assert len(s) == len(o)
    for p, sv, ov in zip(PROBS, s, o):
        assert _bits(sv) == _bits(ov), (
            f"p={p}: spark={sv!r} ({_bits(sv):#x}) oracle={ov!r} ({_bits(ov):#x})"
        )


def test_quantile_cont_actually_diverges_on_repeated_run():
    """Documents WHY the helper exists: plain quantile_cont disagrees with
    Spark's equal-keys shortcut when a fractional position falls inside a
    repeated run (here it rounds 1 ulp ABOVE k; the sf0.1 curriculum case
    rounded 1 ulp below).  If DuckDB ever changes this, the helper is
    still correct — revisit the policy note, not the helper."""
    k = 0.9894380669858468  # k*(hi-pos) + k*(pos-lo) != k at pos=0.3*7
    vals = [0.1, 0.2] + [k] * 6
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS v", [vals])
    qc = con.sql("SELECT quantile_cont(v, [0.3]) FROM t").fetchone()[0][0]
    mirror = con.sql(spark_percentile_edges_select("t", "v", [0.3])).fetchone()[0][0]
    assert _bits(mirror) == _bits(k), "Spark shortcut returns k exactly"
    if _bits(qc) == _bits(k):
        # A DuckDB upgrade changed quantile_cont's rounding on this input.
        # The mirror above still passed, so the helper remains correct —
        # this is a policy-note staleness signal, not a correctness bug.
        pytest.skip(
            f"quantile_cont no longer diverges on the repeated run "
            f"(duckdb {duckdb.__version__}): revisit the SURVEY §5 "
            f"determinism policy note; the edges helper is unaffected"
        )


def test_empty_relation_is_null(spark):
    """n=0 guard: Spark percentile over an empty relation is NULL (not a
    list of NULLs); the mirror must render the same shape."""
    df = spark.createDataFrame([], "v double")
    s = df.selectExpr("percentile(v, array(0.5, 0.9)) AS e").first()["e"]
    assert s is None
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    o = con.sql(spark_percentile_edges_select("t", "v", [0.5, 0.9])).fetchone()[0]
    assert o is None


def test_null_exclusion(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "v double")
    s = df.selectExpr("percentile(v, array(0.5)) AS e").first()["e"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest([1.0, 2.0, 3.0, 4.0, NULL]::DOUBLE[]) AS v"
    )
    o = con.sql(spark_percentile_edges_select("t", "v", [0.5])).fetchone()[0]
    assert _bits(s[0]) == _bits(o[0])
