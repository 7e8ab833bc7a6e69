"""Layout-mutation fuzz machinery contracts.

The layout axis (scripts/fuzz_correctness.py --layout) only proves
anything if the seeded builder (a) is deterministic per seed, (b) leaves
the VALUES exactly equal to the source (layout is the only thing that
may change — otherwise a FAIL would be a builder artifact, not an engine
bug), and (c) actually produces the layout its manifest claims.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/scripts")
import fuzz_correctness as FZ  # noqa: E402

# seed 51 shards lineitem into a directory at the sf0.001 source scale
# (found by seed search; pinned so the directory path stays covered)
SEED = 51


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layoutfuzz") / "d")
    manifest = FZ.build_layout_dir(out, SEED)
    return out, manifest


def _glob(path: str) -> str:
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def test_builder_deterministic(built, tmp_path):
    out, manifest = built
    again = FZ.build_layout_dir(str(tmp_path / "d2"), SEED)
    assert manifest == again


def test_values_identical_to_source(built):
    """EXCEPT ALL both ways is empty for every table: the layout axis
    never changes a single cell, only the physical arrangement."""
    out, _ = built
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = _glob(f"{FZ.SRC}/{t}.parquet")
        dst = _glob(f"{out}/{t}.parquet")
        for a, b in ((src, dst), (dst, src)):
            n = con.sql(
                f"SELECT COUNT(*) FROM "
                f"(SELECT * FROM '{a}' EXCEPT ALL SELECT * FROM '{b}')"
            ).fetchone()[0]
            assert n == 0, f"{t}: {n} rows differ ({a} minus {b})"
    con.close()


def test_manifest_matches_actual_layout(built):
    """The recorded file/row-group counts are re-derivable from the
    written parquet, and the seed-51 shards mutation really produced a
    multi-file DIRECTORY for lineitem (the shape that caught the
    streaming zero-input-files bug)."""
    import pyarrow.parquet as pq

    out, manifest = built
    by_table = {m.split(":")[0]: m for m in manifest}
    assert "shards" in by_table["lineitem"]
    assert os.path.isdir(f"{out}/lineitem.parquet")
    for t, m in by_table.items():
        path = f"{out}/{t}.parquet"
        parts = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        rgs = sum(pq.ParquetFile(p).num_row_groups for p in parts)
        assert f"-> {len(parts)} file(s), {rgs} row group(s)" in m
    # every manifest entry follows the documented shape
    for t, m in by_table.items():
        assert re.fullmatch(
            rf"{t}: \w+(\+shuffle)? -> \d+ file\(s\), \d+ row group\(s\), "
            rf"\d+ rows",
            m,
        ), m
    lineitem_parts = os.listdir(f"{out}/lineitem.parquet")
    assert len([f for f in lineitem_parts if f.endswith(".parquet")]) >= 2
