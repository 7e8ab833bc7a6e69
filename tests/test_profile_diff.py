"""Profile drift tests (operators/profile_diff.py)."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import METRICS_SCHEMA
from data_profiler_for_aws_glue_data_catalog_spark.operators.profile_diff import profile_diff


def _m(spark, rows):
    return spark.createDataFrame(
        [("Column", inst, name, v, "double") for inst, name, v in rows],
        METRICS_SCHEMA,
    )


def test_change_classes(spark):
    old = _m(spark, [
        ("a", "Mean", 1.0),
        ("a", "Sum", 10.0),
        ("a", "Minimum", 0.0),
        ("b", "Mean", None),
    ])
    new = _m(spark, [
        ("a", "Mean", 1.5),          # changed
        ("a", "Minimum", 0.0),       # unchanged
        ("b", "Mean", None),         # unchanged (NULL == NULL, null-safe)
        ("c", "Mean", 3.0),          # added
    ])                               # a/Sum removed
    got = {
        (r["instance"], r["name"]): (r["change"], r["delta"])
        for r in profile_diff(old, new).collect()
    }
    assert got[("a", "Mean")] == ("changed", 0.5)
    assert got[("a", "Minimum")] == ("unchanged", 0.0)
    assert got[("a", "Sum")][0] == "removed" and got[("a", "Sum")][1] is None
    assert got[("b", "Mean")][0] == "unchanged"
    assert got[("c", "Mean")][0] == "added" and got[("c", "Mean")][1] is None
    assert len(got) == 5
