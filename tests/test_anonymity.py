"""k_anonymity audit semantics."""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators.anonymity import k_anonymity


def test_k_anonymity_counts(spark):
    rows = (
        [("z1", "m", "a")] * 10        # safe, diverse? sensitive all 'a' -> low diversity
        + [("z2", "f", "b")] * 2       # unsafe (size < 5), low diversity
        + [("z3", "m", "c"), ("z3", "m", "d"),
           ("z3", "m", "e"), ("z3", "m", "f"), ("z3", "m", "g")]  # safe + diverse
    )
    df = spark.createDataFrame(rows, "zip string, sex string, diag string")
    r = k_anonymity(df, ["zip", "sex"], "diag", k=5, l=2).collect()[0]
    assert r["n_rows"] == 17 and r["n_groups"] == 3
    assert r["min_group_size"] == 2
    assert r["n_unsafe_groups"] == 1 and r["n_unsafe_rows"] == 2
    assert r["n_lowdiv_groups"] == 2 and r["n_lowdiv_rows"] == 12
