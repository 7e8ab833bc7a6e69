"""Skew-axis fuzz machinery + entity-key dedup contracts.

The skew axis (scripts/fuzz_correctness.py --skew) amplifies one seeded
hot key per chosen table; it only proves anything if the builder (a) is
deterministic per seed, (b) produces exactly the amplification its
manifest claims, and (c) leaves every non-hot row untouched.  The axis'
first find (seed 1: 128 duplicate vec_ids) motivated the entity-key
contract in dedup.entity_normed, pinned here on the engine side.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/scripts")
import fuzz_correctness as FZ  # noqa: E402

# seed 1 amplifies lineitem.l_suppkey 128x AND duplicates one doc_id and
# one vec_id 128x — the exact dataset that exposed the IVF centroid
# degeneracy; pinned so the identity-column duplication path stays covered
SEED = 1

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

MANIFEST_RE = re.compile(
    r"skew (\w+)\.(\w+)=(\S+) x(\d+) \((\d+) -> (\d+) rows\)"
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewfuzz") / "d")
    manifest = FZ.build_skew_dir(out, SEED)
    return out, manifest


def test_builder_deterministic(built, tmp_path):
    out, manifest = built
    again = FZ.build_skew_dir(str(tmp_path / "d2"), SEED)
    assert manifest == again
    # seed 1 must keep covering the identity-column duplication shape
    assert any(m.startswith("skew embeddings.vec_id=") for m in manifest)
    assert any(m.startswith("skew documents.doc_id=") for m in manifest)


def test_manifest_amplification_is_real(built):
    """For every skew entry the hot group really holds orig*k rows, and
    k is one of the declared amplification factors."""
    out, manifest = built
    con = duckdb.connect()
    skews = [m for m in manifest if m.startswith("skew ")]
    assert skews, "seed produced no hot-key mutations"
    for m in skews:
        mm = MANIFEST_RE.fullmatch(m)
        assert mm, m
        t, c, v, k, g, gk = mm.groups()
        assert int(k) in FZ.SKEW_AMP
        assert int(gk) == int(g) * int(k)
        hv = v if re.fullmatch(r"-?\d+", v) else f"'{v}'"
        got = con.sql(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet' WHERE {c} = {hv}"
        ).fetchone()[0]
        assert got == int(gk), f"{t}.{c}: {got} != {gk}"
    con.close()


def test_non_hot_rows_untouched(built):
    """Minus the amplification (and any nullkey mutation), the mutated
    table is value-identical to the source — in BOTH directions and at
    per-row MULTIPLICITY, not just DISTINCT containment (round-8 advice:
    the one-directional DISTINCT check would miss silently dropped rows
    or collapsed pre-existing duplicates on non-hot keys)."""
    out, manifest = built
    nulled = {
        m.split()[1].split(".")[0] for m in manifest if m.startswith("nullkey")
    }
    hot = {}  # table -> (key column, hot value literal)
    for m in manifest:
        mm = MANIFEST_RE.fullmatch(m)
        if mm:
            t, c, v = mm.group(1), mm.group(2), mm.group(3)
            hot[t] = (c, v if re.fullmatch(r"-?\d+", v) else f"'{v}'")
    con = duckdb.connect()
    for t in TABLES:
        if t in nulled:
            continue
        # exclude only the hot group (its multiplicity IS the mutation);
        # everything else must agree as a MULTISET in both directions.
        # EXCEPT ALL keeps duplicate multiplicity and treats NULL cells
        # as equal, so dropped rows AND collapsed duplicates both fail.
        c, hv = hot.get(t, (None, None))
        where = f"WHERE {c} IS DISTINCT FROM {hv}" if c else ""
        for a, b, what in (
            (out, FZ.SRC, "mutated rows not in source"),
            (FZ.SRC, out, "source rows missing from mutated"),
        ):
            n = con.sql(
                f"SELECT COUNT(*) FROM ("
                f"SELECT * FROM '{a}/{t}.parquet' {where} "
                f"EXCEPT ALL SELECT * FROM '{b}/{t}.parquet' {where})"
            ).fetchone()[0]
            assert n == 0, f"{t}: {n} {what}"
    con.close()


def test_dedup_within_null_key_parts_stay_distinct(spark):
    """concat_ws silently SKIPS null parts, which would conflate
    (NULL, 'error') with ('error',); the composite key must render NULL
    parts as the explicit sentinel so NULL-keyed groups stay distinct
    and group together (skew fuzz NULL-key find, seed 4)."""
    import datetime as dt

    from data_profiler_for_aws_glue_data_catalog_spark.operators.row_dedup import dedup_within_interval

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, None, "error"),                          # NULL user
        (2, t0 + dt.timedelta(seconds=30), None, "error"),  # dup of ^
        (3, t0 + dt.timedelta(seconds=40), "error", None),  # reversed shape
        (4, t0 + dt.timedelta(seconds=50), "u1", "error"),
        # a REAL '∅' value renders the same display key as NULL but must
        # stay a distinct group: key_nulls disambiguates (round-8 advice)
        (5, t0 + dt.timedelta(seconds=55), "∅", "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    out = {
        r["event_id"]: (r["key"], r["key_nulls"], r["is_dup"])
        for r in dedup_within_interval(
            df, ["user_id", "event_type"], "ts", "event_id"
        ).collect()
    }
    assert out[1] == ("∅|error", "10", False)
    assert out[2] == ("∅|error", "10", True)  # same NULL-user key: dup
    assert out[3] == ("error|∅", "01", False)  # NOT conflated with ^
    assert out[4] == ("u1|error", "00", False)
    # same display key as 1/2, different bitmap -> NOT a dup of them
    assert out[5] == ("∅|error", "00", False)


def test_entity_normed_conflicting_duplicates_mirror_oracle(spark, tmp_path):
    """Duplicate ids with DIFFERENT vectors (data corruption, not mere
    replication): both engines must pick the SAME lexicographically
    smallest (vector, norm) representative — Spark min(struct(array,
    double)) vs the oracle's row_number ORDER BY v, nrm over DuckDB
    lists. Differential: same parquet through both paths."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_profiler_for_aws_glue_data_catalog_spark.operators.dedup import entity_normed
    from data_profiler_for_aws_glue_data_catalog_spark.oracle_ext import _normed_vectors_sql

    rows = [
        (0, [0.5, -1.0]), (0, [0.5, -2.0]), (0, [-0.5, 3.0]),
        (1, [1.0, 1.0]),
        (2, [0.0, 0.0]), (2, [0.0, 2.0]),   # zero vector dropped FIRST
        (3, [2.0]), (3, [2.0, -9.0]),       # prefix: shorter sorts first
    ]
    p = str(tmp_path / "em.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float64())
                ),
            }
        ),
        p,
    )
    df = spark.read.parquet(p)
    got = {
        r["id"]: (list(r["_v"]), r["_norm"])
        for r in entity_normed(df, "embedding", "vec_id").collect()
    }
    con = duckdb.connect()
    sql = _normed_vectors_sql(f"'{p}'", "embedding", "vec_id")
    want = {
        r[0]: (list(r[1]), r[2]) for r in con.execute(sql).fetchall()
    }
    con.close()
    assert set(got) == set(want) == {0, 1, 2, 3}
    for i in got:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert abs(got[i][1] - want[i][1]) == 0.0
    # and the chosen representatives are the expected minima
    assert got[0][0] == [-0.5, 3.0]
    assert got[2][0] == [0.0, 2.0]   # zero-norm row filtered pre-dedup
    assert got[3][0] == [2.0]        # prefix is lexicographically smaller


def test_entity_normed_collapses_duplicates(spark):
    """Duplicate-id vector rows collapse to ONE deterministic
    representative (lexicographically smallest (_v, _norm)) — the
    entity-key contract that keeps centroid seeding and top-k sane under
    hot-key amplification."""
    from pyspark.sql import functions as F

    from data_profiler_for_aws_glue_data_catalog_spark.operators.dedup import entity_normed
    from data_profiler_for_aws_glue_data_catalog_spark.operators.similarity import collect_centroids

    rows = [(0, [3.0, 4.0])] * 5 + [(0, [0.6, 0.8]), (1, [1.0, 0.0]),
                                    (2, [0.0, 2.0]), (2, [0.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    e = entity_normed(df, "embedding", "vec_id")
    got = {r["id"]: (r["_v"], r["_norm"]) for r in e.collect()}
    assert set(got) == {0, 1, 2}
    # id 0: [0.6, 0.8] < [3.0, 4.0] lexicographically
    assert got[0][0] == [0.6, 0.8]
    # centroid seeding sees distinct ids, not 5 copies of id 0
    cents = collect_centroids(e, 3)
    assert [c[0] for c in cents] == [0, 1, 2]
