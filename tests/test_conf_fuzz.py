"""Session-config fuzz axis contracts (scripts/fuzz_correctness.py
--sparkconf): the seeded conf draw must be deterministic, within the
declared matrix, and actually varied across seeds."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")
import fuzz_correctness as FZ  # noqa: E402


def test_pick_conf_deterministic_and_in_matrix():
    for seed in range(1, 20):
        a, b = FZ.pick_conf(seed), FZ.pick_conf(seed)
        assert a == b
        assert set(a) == set(FZ.CONF_AXIS)
        for k, v in a.items():
            assert v in FZ.CONF_AXIS[k], (seed, k, v)


def test_pick_conf_varies_across_seeds():
    draws = {tuple(sorted(FZ.pick_conf(s).items())) for s in range(1, 20)}
    assert len(draws) > 5
