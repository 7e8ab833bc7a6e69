from __future__ import annotations

import pytest

from data_profiler_for_aws_glue_data_catalog_spark.operators import projection as PJ


@pytest.fixture()
def vecs(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [2.0, 3.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_projection_values(spark, vecs):
    # planes = vectors of ids 1, 2 -> projections are plain dot products
    got = {
        (r.id, r.dim): r.value
        for r in PJ.project_embeddings(vecs, 2).collect()
    }
    assert got[(3, 0)] == pytest.approx(2.0)  # dot([2,3],[1,0])
    assert got[(3, 1)] == pytest.approx(3.0)  # dot([2,3],[0,1])
    assert got[(1, 0)] == pytest.approx(1.0)
    assert got[(1, 1)] == pytest.approx(0.0)


def test_projection_no_shuffle(spark, embeddings):
    plan = (
        PJ.project_embeddings(embeddings, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan


def test_quantization_bounds_and_midpoints(spark, vecs):
    got = {
        (r.id, r.dim): r.q for r in PJ.quantize_embeddings(vecs, 2).collect()
    }
    # dim 0: values [1, 0, 2] -> min 0 max 2 -> q = x/2*255
    assert got[(2, 0)] == 0
    assert got[(3, 0)] == 255
    assert got[(1, 0)] == 128  # floor(127.5 + 0.5)
    # dim 1: values [0, 1, 3]
    assert got[(3, 1)] == 255 and got[(1, 1)] == 0


def test_quantization_constant_dim_zero(spark):
    df = spark.createDataFrame(
        [(1, [5.0]), (2, [5.0])], "vec_id bigint, embedding array<double>"
    )
    assert all(r.q == 0 for r in PJ.quantize_embeddings(df, 1).collect())
