"""K-means Lloyd step: mean correctness and a converging driver loop."""

from __future__ import annotations

import math

from data_profiler_for_aws_glue_data_catalog_spark.operators.kmeans import kmeans_step


def _embs(spark):
    # two tight clusters around (1, 0) and (0, 1)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
        (4, [0.8, 0.0]),
        (5, [0.0, 0.8]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _centroids_from(rows):
    by_cell: dict[int, dict[int, float]] = {}
    members: dict[int, int] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], {})[r["dim"]] = r["value"]
        members[r["cell"]] = r["n_members"]
    out = []
    for cell, dims in sorted(by_cell.items()):
        vec = [dims[i] for i in range(len(dims))]
        norm = math.sqrt(sum(x * x for x in vec))
        out.append((cell, vec, norm))
    return out, members


def test_kmeans_step_means(spark):
    rows = kmeans_step(_embs(spark), n_cells=2).collect()
    cents, members = _centroids_from(rows)
    # seeds = ids 0 and 1 -> cosine assignment splits the two clusters
    assert members == {0: 3, 1: 3}
    (c0, v0, _), (c1, v1, _) = cents
    assert v0[0] > 0.8 and v0[1] < 0.1   # mean of cluster around (1, 0)
    assert v1[0] < 0.1 and v1[1] > 0.8   # mean of cluster around (0, 1)


def test_kmeans_driver_loop_converges(spark):
    """Feeding updated centroids back reproduces the same assignment —
    this configuration is a Lloyd fixed point after one step."""
    e = _embs(spark)
    step1 = kmeans_step(e, n_cells=2).collect()
    cents1, _ = _centroids_from(step1)
    step2 = kmeans_step(e, centroids=cents1).collect()
    cents2, members2 = _centroids_from(step2)
    assert members2 == {0: 3, 1: 3}
    for (_, v1, _), (_, v2, _) in zip(cents1, cents2):
        assert all(abs(a - b) < 1e-9 for a, b in zip(v1, v2))


def test_kmeans_train_matches_manual_loop(spark):
    """kmeans_train(n_iters=2) == manually feeding round-1 centroids back."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.kmeans import (
        centroids_from_rows,
        kmeans_train,
    )

    e = _embs(spark)
    manual = kmeans_step(
        e, n_cells=2, centroids=centroids_from_rows(
            kmeans_step(e, n_cells=2).collect()
        )
    )
    got = {(r["cell"], r["dim"]): (r["value"], r["n_members"])
           for r in kmeans_train(e, n_cells=2, n_iters=2).collect()}
    ref = {(r["cell"], r["dim"]): (r["value"], r["n_members"])
           for r in manual.collect()}
    assert got == ref


def test_kmeans_train_single_iter_is_step(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.kmeans import kmeans_train

    e = _embs(spark)
    a = sorted(map(tuple, kmeans_train(e, n_cells=2, n_iters=1).collect()))
    b = sorted(map(tuple, kmeans_step(e, n_cells=2).collect()))
    assert a == b


def test_trained_centroids_drive_ivf(spark):
    """The trained centroid list slots into similarity.assign_cells —
    every vector lands in a live cell."""
    from data_profiler_for_aws_glue_data_catalog_spark.operators.kmeans import (
        centroids_from_rows,
        kmeans_train,
    )
    from data_profiler_for_aws_glue_data_catalog_spark.operators.dedup import with_norm
    from data_profiler_for_aws_glue_data_catalog_spark.operators.similarity import assign_cells
    from pyspark.sql import functions as F

    e = _embs(spark)
    cents = centroids_from_rows(kmeans_train(e, n_cells=2, n_iters=2).collect())
    normed = with_norm(e, "embedding").select(
        F.col("vec_id").alias("id"), "_v", "_norm"
    )
    assigned = assign_cells(normed, cents)
    cells = {r["cell"] for r in assigned.select("cell").collect()}
    assert cells <= {c for c, _, _ in cents}
    assert assigned.count() == 6
