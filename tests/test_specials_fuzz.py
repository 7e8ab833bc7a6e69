"""Float-specials fuzz axis machinery (scripts/fuzz_correctness.py
--specials): the axis only proves anything if the builder is seeded-
deterministic, actually injects the specials it claims, preserves the
schema, and replays registered, oracle-hashed queries."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/scripts")
import fuzz_correctness as FZ  # noqa: E402

SEED = 1


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("specialsfuzz") / "d")
    manifest = FZ.build_specials_dir(out, SEED)
    return out, manifest


def test_builder_deterministic(built, tmp_path):
    out, manifest = built
    again = FZ.build_specials_dir(str(tmp_path / "d2"), SEED)
    assert manifest == again
    assert any(m.startswith("specials ") for m in manifest)


def test_specials_actually_injected(built):
    """Each manifest entry's column really contains the claimed specials
    (at least one NaN or ±Inf or signed zero beyond the source data)."""
    out, manifest = built
    con = duckdb.connect()
    for m in manifest:
        if not m.startswith("specials ") or "embedding" in m:
            continue
        tc = m.split()[1].rstrip(":")
        t, c = tc.split(".")
        nan, inf, negz, huge = con.sql(
            f"SELECT COUNT(*) FILTER (WHERE isnan({c})),"
            f" COUNT(*) FILTER (WHERE abs({c}) = 'Infinity'::DOUBLE),"
            f" COUNT(*) FILTER (WHERE {c} = 0.0 AND signbit({c})),"
            f" COUNT(*) FILTER (WHERE abs({c}) >= 5.0e10"
            f"   AND abs({c}) < 'Infinity'::DOUBLE)"
            f" FROM '{out}/{t}.parquet'"
        ).fetchone()
        assert nan + inf + negz + huge > 0, f"{t}.{c}: no specials injected"
    con.close()


def test_schema_preserved(built):
    out, _ = built
    con = duckdb.connect()
    for t in ("customer", "supplier", "events", "embeddings"):
        a = con.sql(f"DESCRIBE SELECT * FROM '{FZ.SRC}/{t}.parquet'").fetchall()
        b = con.sql(f"DESCRIBE SELECT * FROM '{out}/{t}.parquet'").fetchall()
        assert [(x[0], x[1]) for x in a] == [(x[0], x[1]) for x in b], t
    con.close()


def test_row_counts_preserved(built):
    """Specials REPLACE values; they never add or drop rows."""
    out, _ = built
    con = duckdb.connect()
    for t in ("region", "customer", "supplier", "events", "embeddings"):
        n0 = con.sql(f"SELECT COUNT(*) FROM '{FZ.SRC}/{t}.parquet'").fetchone()[0]
        n1 = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        assert n0 == n1, t
    con.close()


def test_specials_queries_are_registered_with_oracles():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    missing = [q for q in FZ.SPECIALS_QUERIES if q not in qs]
    assert missing == []
    no_oracle = [q for q in FZ.SPECIALS_QUERIES if q not in os_]
    assert no_oracle == []
    assert len(FZ.SPECIALS_QUERIES) == len(set(FZ.SPECIALS_QUERIES))


def test_injection_targets_are_double_columns():
    """Specials only make sense in floating-point columns; a target
    list drift to an int/decimal column would silently change types."""
    con = duckdb.connect()
    for t, c in FZ.SPECIALS_TARGETS:
        typ = {
            r[0]: r[1]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{FZ.SRC}/{t}.parquet'"
            ).fetchall()
        }[c]
        assert typ in ("DOUBLE", "FLOAT"), f"{t}.{c} is {typ}"
    con.close()
