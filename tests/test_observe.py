"""Observation-piggyback profiling: metrics collected during a user job
must equal the dedicated fused-scan pass."""

from __future__ import annotations

import math

from data_profiler_for_aws_glue_data_catalog_spark.operators.observe import attach_scan_observation
from data_profiler_for_aws_glue_data_catalog_spark.operators.scan_metrics import scan_metrics_long

SF_SMOKE = "/root/testdata/sf0.001"


def _m(df_or_rows):
    rows = df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
    return {(r["instance"], r["name"]): r["value"] for r in rows}


def test_observed_equals_scan_pass(spark, lineitem):
    observed, handle = attach_scan_observation(lineitem)
    # the "user job": a count action — metrics ride along, no profile scan
    observed.count()
    got = _m(handle.metrics(spark))
    # Distinctness needs a DISTINCT aggregate — not observable by design
    want = {
        k: v
        for k, v in _m(scan_metrics_long(lineitem)).items()
        if k[1] != "Distinctness"
    }

    assert set(got) == set(want)
    for k, v in want.items():
        g = got[k]
        if v is None or g is None:
            assert g == v, k
        elif k[1].startswith(("ApproxQuantiles", "ApproxCountDistinct")):
            # sketches merge in partition order; allow sketch-level wiggle
            assert math.isclose(g, v, rel_tol=0.05, abs_tol=1e-9), k
        else:
            assert math.isclose(g, v, rel_tol=0, abs_tol=0) or g == v, k


def test_observed_rides_a_write(spark, lineitem, tmp_path):
    """The intended usage: profile while WRITING the table (no extra scan)."""
    observed, handle = attach_scan_observation(lineitem, include_approx=False)
    observed.write.mode("overwrite").parquet(str(tmp_path / "copyout"))
    got = _m(handle.metrics(spark))
    assert got[("*", "Size")] == float(lineitem.count())
    assert ("l_quantity", "Mean") in got
