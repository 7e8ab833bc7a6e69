from __future__ import annotations

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# Queries intentionally registered WITHOUT an oracle (driver records a
# rows-only check) — each must carry a documented reason.
ROWS_ONLY = {
    "profile_lineitem_approx",   # sketch metrics (HLL++/quantile sketches)
    "file_balance_lineitem",     # file identity invisible to DuckDB
}


def test_every_query_has_oracle_or_documented_exemption():
    m = _entry()
    qs, os_ = set(m.queries()), set(m.oracle_sql())
    assert qs - os_ == ROWS_ONLY
    # no orphan oracles
    assert os_ <= qs


def test_oracles_are_nonempty_sql():
    m = _entry()
    for name, sql in m.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
