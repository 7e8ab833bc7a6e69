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
# rows-only check) — each must carry a documented reason.  Empty since r8:
# the two former members gained bounds/verdict oracles
# (profile_lineitem_approx -> approx_bounds_verdict all-TRUE inventory,
# file_balance_lineitem -> n_rows conservation + consistency verdict).
ROWS_ONLY: set[str] = set()


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


def test_gate_priority_window_is_intact():
    """The driver hash-gates the first ~50 registered queries; queries()
    front-loads _GATE_PRIORITY into that window.  The `if k in q` guard in
    queries() means a typo'd or renamed priority entry would be dropped
    SILENTLY, sliding the window onto unintended queries — pin it here."""
    m = _entry()
    q = m.queries()
    gp = m._GATE_PRIORITY
    missing = [k for k in gp if k not in q]
    assert not missing, f"_GATE_PRIORITY names not registered: {missing}"
    assert len(gp) == len(set(gp)) == 50, "driver gate window is ~50 queries"
    assert list(q)[: len(gp)] == gp
    # since r8 EVERY gated query is hash-checked: the former rows-only
    # sketch sentinel (profile_lineitem_approx) now emits a bounds verdict
    # with an all-TRUE inventory oracle.
    os_ = m.oracle_sql()
    assert [k for k in gp if k not in os_] == []


def test_gate_window_completes_the_rotation():
    """Rotation-completeness invariant: every query that has never had a
    driver-gated row (absent from all recorded CORRECTNESS_r*.json) must
    sit inside the current first-50 window, so the next driver run closes
    the gap. Holds trivially once coverage is complete (empty never-gated
    set) — i.e. this also pins that the steady-state sentinel window can
    never strand an ungated query."""
    import glob
    import json

    gated: set[str] = set()
    for p in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        with open(p) as f:
            gated |= set(json.load(f))
    m = _entry()
    qs = list(m.queries())
    never = {q for q in qs if q not in gated}
    stranded = sorted(never - set(qs[:50]))
    assert stranded == [], f"never-gated queries outside the window: {stranded}"
