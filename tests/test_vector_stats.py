from __future__ import annotations

import math

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import vector_stats as VS


def test_dim_stats_small_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [3.0, 30.0]), (3, [5.0, 50.0])],
        "id int, embedding array<double>",
    )
    rows = {r.dim: r for r in VS.vector_dim_stats(df, 2).collect()}
    assert rows[0].mean == pytest.approx(3.0)
    assert rows[0].min_val == 1.0 and rows[0].max_val == 5.0
    # population std of [1,3,5]
    assert rows[0].std == pytest.approx(math.sqrt(8 / 3), abs=1e-6)
    assert rows[1].mean == pytest.approx(30.0)
    assert all(r.n_present == 3 for r in rows.values())


def test_dim_stats_null_vector_and_short_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [7.0])],
        "id int, embedding array<double>",
    )
    rows = {r.dim: r for r in VS.vector_dim_stats(df, 2).collect()}
    assert rows[0].n_present == 2  # null vector contributes nothing
    assert rows[1].n_present == 1  # short vector missing dim 1
    assert rows[1].mean == pytest.approx(2.0)


def test_dim_stats_single_fused_pass(spark, embeddings):
    plan = (
        VS.vector_dim_stats(embeddings, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Exchange hashpartitioning" not in plan  # no data shuffle


def test_norm_stats_quality_counts(spark):
    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),          # norm 5
            (2, None),                # null
            (3, [1.0]),               # wrong dim
            (4, [float("nan"), 0.0]), # non-finite
            (5, [0.0, 0.0]),          # zero vector
        ],
        "id int, embedding array<double>",
    )
    r = VS.vector_norm_stats(df, 2).collect()[0]
    assert r.n_vectors == 5
    assert r.n_null == 1
    assert r.n_wrong_dim == 1
    assert r.n_nonfinite == 1
    assert r.n_zero == 1
    # clean vectors: (3,4) and (0,0) -> norms 5.0, 0.0
    assert r.min_norm == 0.0
    assert r.max_norm == 5.0
    assert r.mean_norm == pytest.approx(2.5)


def test_norm_stats_empty(spark):
    df = spark.createDataFrame([], "id int, embedding array<double>")
    r = VS.vector_norm_stats(df, 2).collect()[0]
    assert r.n_vectors == 0
    assert r.mean_norm is None and r.min_norm is None


def test_embedding_drift_identical_snapshots(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.vector_stats import embedding_drift

    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in range(4)],
        "vec_id bigint, embedding array<double>",
    )
    r = embedding_drift(df, df, 3).collect()[0]
    assert r.cosine_of_means == 1.0
    assert r.mean_shift_l2 == 0.0
    assert r.mean_norm_old == r.mean_norm_new == 1.0


def test_embedding_drift_orthogonal(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.vector_stats import embedding_drift

    a = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>")
    b = spark.createDataFrame([(2, [0.0, 1.0])], "vec_id bigint, embedding array<double>")
    r = embedding_drift(a, b, 2).collect()[0]
    assert r.cosine_of_means == 0.0
    assert abs(r.mean_shift_l2 - 2 ** 0.5) < 1e-5
