"""Schema-mutation fuzz machinery contracts.

The schema axis (scripts/fuzz_correctness.py --schema) only proves
anything if (a) the oracle's footer-derived column inventory is exactly
the static contract on unmutated data, and (b) the seeded mutation builder
is deterministic and actually writes the schema its manifest claims.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

from data_profiler_for_aws_glue_data_catalog_spark import oracle as O

sys.path.insert(0, "/root/repo/scripts")
import fuzz_correctness as FZ  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_derived_inventory_matches_static_contract():
    """derive_schema_columns on the canonical testdata must reproduce the
    hand-pinned TABLE_COLUMNS/CONVERT_COLUMNS exactly — kinds, spark type
    strings, column order, and the convertible set."""
    tc, cc = O.derive_schema_columns(SF)
    assert tc == O.TABLE_COLUMNS
    assert cc == O.CONVERT_COLUMNS


def test_classify_arrow_mapping():
    import pyarrow as pa

    cases = {
        pa.string(): (O.TEXT, "string"),
        pa.large_string(): (O.TEXT, "string"),
        pa.int32(): (O.NUM, "int"),
        pa.int64(): (O.NUM, "bigint"),
        pa.float32(): (O.NUM, "float"),
        pa.float64(): (O.NUM, "double"),
        pa.decimal128(18, 6): (O.NUM, "decimal(18,6)"),
        pa.bool_(): ("convert", "boolean"),
        pa.date32(): ("convert", "date"),
        pa.timestamp("us"): ("convert", "timestamp"),
        pa.list_(pa.float32()): (None, None),  # skipped, like the engine
        pa.binary(): (None, None),
    }
    for t, expect in cases.items():
        assert O._classify_arrow(t) == expect, t


def test_schema_queries_are_registered_with_expected_oracles():
    """Every replayed query must exist and be oracle-hashed (since r8 the
    former rows-only sketch query carries a bounds-verdict oracle)."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    missing = [q for q in FZ.SCHEMA_QUERIES if q not in qs]
    assert missing == []
    rows_only = [q for q in FZ.SCHEMA_QUERIES if q not in os_]
    assert rows_only == []


def test_orders_is_frozen_in_mutation_candidates():
    """The frozen-table contract: no structural mutation may target orders
    (its verify/infer/keys/schema-diff oracles hardcode the inventory)."""
    for cands in (FZ.SCHEMA_DROP, FZ.SCHEMA_RENAME, FZ.SCHEMA_RETYPE,
                  FZ.SCHEMA_ALLNULL, FZ.SCHEMA_SINGLE_ROW):
        assert all(t != "orders" for t, _ in cands)
    assert "orders" not in FZ.SCHEMA_ADD_PK


@pytest.mark.parametrize("seed", [1, 2])
def test_build_schema_dir_is_deterministic_and_honest(tmp_path, seed):
    """Same seed -> same manifest and same output schemas; the written
    footers must reflect every manifest line (drop gone, rename present
    under the new name, retype widened, adds appended)."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = FZ.build_schema_dir(d1, seed)
    m2 = FZ.build_schema_dir(d2, seed)
    assert m1 == m2
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        s1 = pq.read_schema(os.path.join(d1, f"{t}.parquet"))
        s2 = pq.read_schema(os.path.join(d2, f"{t}.parquet"))
        assert s1.equals(s2), t
    # orders untouched vs the source
    src = pq.read_schema(f"{FZ.SRC}/orders.parquet")
    out = pq.read_schema(os.path.join(d1, "orders.parquet"))
    assert src.equals(out)
    # manifest honesty
    schemas = {
        t: pq.read_schema(os.path.join(d1, f"{t}.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "lineitem", "events", "documents", "embeddings")
    }
    for line in m1:
        kind, rest = line.split(" ", 1)
        if kind == "drop":
            t, c = rest.split(".")
            assert c not in schemas[t].names, line
        elif kind == "rename":
            ref, new = rest.split(" -> ")
            t, c = ref.split(".")
            assert c not in schemas[t].names and new in schemas[t].names, line
        elif kind == "retype":
            t, c = rest.split(" ")[0].split(".")
            import pyarrow as pa

            assert schemas[t].field(c).type == pa.int64(), line
        elif kind == "add":
            t = rest.split(".")[0]
            assert {"fz_note", "fz_score"} <= set(schemas[t].names), line
        elif kind == "allnull":
            t, c = rest.split(".")
            assert c in schemas[t].names, line
        elif kind in ("single-row", "empty"):
            t = rest
            n = pq.read_metadata(os.path.join(d1, f"{t}.parquet")).num_rows
            assert n == (1 if kind == "single-row" else 0), line
