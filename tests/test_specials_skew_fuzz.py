"""Combined specials x skew fuzz axis (r9): specials injection staged
first, then hot-key amplification OVER the injected tables — the axis
product (replicated hot groups whose rows carry NaN/±Inf) that neither
axis poses alone. These pin the builder chain itself: determinism,
source-dir honoring, and that the product actually materializes."""

from __future__ import annotations

import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/scripts")
import fuzz_correctness as FZ  # noqa: E402

# Seed 11 gives the richest axis product: embeddings gets NaN elements
# AND vec_id x16 amplification; events gets the full specials palette
# (NaN/±Inf/±0 plus the r9 huge finites 1e300 and 5e10) AND user_id
# x128 amplification.
SEED = 11


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("specskew")
    staged, out = str(root / "stage"), str(root / "d")
    m1 = FZ.build_specials_dir(staged, SEED)
    m2 = FZ.build_skew_dir(out, SEED, src_dir=staged)
    return staged, out, m1, m2


def test_chain_deterministic(built, tmp_path):
    staged, out, m1, m2 = built
    again1 = FZ.build_specials_dir(str(tmp_path / "s2"), SEED)
    again2 = FZ.build_skew_dir(
        str(tmp_path / "d2"), SEED, src_dir=str(tmp_path / "s2")
    )
    assert (m1, m2) == (again1, again2)
    shutil.rmtree(str(tmp_path / "s2"))
    shutil.rmtree(str(tmp_path / "d2"))


def test_skew_reads_staged_not_src(built):
    """The amplified output must carry the STAGED specials — if the skew
    builder silently fell back to pristine SRC, the product axis would
    silently test nothing."""
    staged, out, m1, m2 = built
    con = duckdb.connect()
    total = 0
    for m in m1:
        if not m.startswith("specials ") or "embedding" in m:
            continue
        tc = m.split()[1].rstrip(":")
        t, c = tc.split(".")
        probe = (
            f"SELECT COUNT(*) FILTER (WHERE isnan({c})"
            f" OR abs({c}) = 'Infinity'::DOUBLE"
            f" OR ({c} = 0.0 AND signbit({c}))) FROM '{{d}}/{t}.parquet'"
        )
        n_staged = con.sql(probe.format(d=staged)).fetchone()[0]
        n_out = con.sql(probe.format(d=out)).fetchone()[0]
        # amplification replicates rows — it can only keep or grow the
        # special population, never lose it (a tiny table's hash slots
        # can legitimately inject zero: supplier has 10 rows at sf0.001)
        assert n_out >= n_staged, f"{t}.{c}: staged specials lost"
        total += n_out
    assert total > 0, "no detectable specials anywhere in the output"
    con.close()


def test_amplified_group_carries_specials(built):
    """Seed 11 amplifies events.user_id x128 over a
    full-palette-injected events.value AND embeddings.vec_id x16 over
    NaN-injected vectors: the amplified HOT GROUP itself must contain
    special rows — the hot-NaN-group shape the axis exists for."""
    staged, out, m1, m2 = built
    hot_events = [m for m in m2 if m.startswith("skew events.user_id=")]
    assert hot_events, m2
    hot_key = hot_events[0].split("=")[1].split(" ")[0]
    con = duckdb.connect()
    n_hot, n_hot_special = con.sql(
        "SELECT COUNT(*), COUNT(*) FILTER (WHERE isnan(value)"
        " OR abs(value) = 'Infinity'::DOUBLE"
        " OR (value = 0.0 AND signbit(value)))"
        f" FROM '{out}/events.parquet' WHERE user_id = {hot_key}"
    ).fetchone()
    assert n_hot >= 128
    assert n_hot_special > 0, "hot group has no special rows"
    nan_vecs = con.sql(
        f"SELECT COUNT(*) FROM '{out}/embeddings.parquet' WHERE EXISTS ("
        "SELECT 1 FROM unnest(embedding) u(x) WHERE isnan(x))"
    ).fetchone()[0]
    assert nan_vecs > 0
    con.close()


def test_schema_preserved_through_chain(built):
    staged, out, m1, m2 = built
    con = duckdb.connect()
    for t in ("customer", "events", "embeddings", "lineitem"):
        a = con.sql(f"DESCRIBE SELECT * FROM '{FZ.SRC}/{t}.parquet'").fetchall()
        b = con.sql(f"DESCRIBE SELECT * FROM '{out}/{t}.parquet'").fetchall()
        assert [(x[0], x[1]) for x in a] == [(x[0], x[1]) for x in b], t
    con.close()
