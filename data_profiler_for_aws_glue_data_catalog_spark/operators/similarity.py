"""Approximate-nearest-neighbor search over embedding columns.

Two strategies (SURVEY.md §7 Phase 5):

  cosine_topk   exact brute-force top-k — the baseline & verify kernel
  ivf_topk      IVF: coarse-quantize vectors into cells, probe the query's
                nearest ``n_probe`` cells only — the 100 TB scale path

Both are pure DataFrame ops (dot products via F.zip_with/F.aggregate —
JVM-side, no UDF) with exact DuckDB oracles. Determinism contract: cosines
are ROUND6'd before ranking and ties break on neighbor id, so top-k sets
are engine-reproducible.

Scale notes (100 TB)
--------------------
- Queries are broadcast (a handful of vectors); scoring is map-side only.
- Top-k avoids the single-reducer-per-query window trap with a two-stage
  select: partial top-k per (query, salt-of-neighbor) group, then final
  top-k over b*k survivors. Identical result to a global top-k (the global
  top-k is contained in the union of partial top-ks), but the heavy first
  stage fans out over ``salt_buckets * |queries|`` reducers instead of
  |queries|.
- IVF: cell assignment is one broadcast-join + argmin (map-side); the
  probe search touches ~n_probe/n_cells of the data. Centroids here are
  deterministic seed vectors (first ``n_cells`` ids) so the oracle can
  reproduce assignment exactly; swap in k-means centroids at scale — the
  plan shape (broadcast centroids -> assign -> cell-pruned search) is
  unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.functions import text as X
from data_profiler_for_aws_glue_data_catalog_spark.operators.dedup import dot, with_norm


def _cos(va: Column, na: Column, vb: Column, nb: Column) -> Column:
    return X.round6(dot(va, vb) / (na * nb))


def _ranked_topk(scored: DataFrame, k: int, salt_buckets: int = 32) -> DataFrame:
    """Two-stage deterministic top-k per query_id over (query_id,
    neighbor_id, cosine). Rank order: cosine DESC, neighbor_id ASC."""
    order = [F.desc("cosine"), F.asc("neighbor_id")]
    salted = Window.partitionBy(
        "query_id", F.pmod(F.hash("neighbor_id"), F.lit(salt_buckets))
    ).orderBy(*order)
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_pr", F.row_number().over(salted))
        .where(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Output: (query_id, neighbor_id, cosine, rank 1..k).
    """
    e = with_norm(embs, vec_col).select(F.col(id_col).alias("id"), "_v", "_norm")
    q = e.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            _cos(F.col("_qv"), F.col("_qn"), F.col("_v"), F.col("_norm")).alias(
                "cosine"
            ),
        )
    )
    return _ranked_topk(scored, k)


def ivf_assign(
    embs: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, _v, _norm, cell): assign every vector to its nearest centroid.

    Centroids are the vectors with the ``n_cells`` smallest ids —
    deterministic seeding (k-means at scale; same plan shape). Assignment
    = argmax cosine with tie-break on centroid id, via a broadcast join +
    row_number, all map-side under AQE broadcast.
    """
    e = with_norm(embs, vec_col).select(F.col(id_col).alias("id"), "_v", "_norm")
    cents = e.orderBy("id").limit(n_cells).select(
        F.col("id").alias("cell"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("_ccos"), F.asc("cell"))
    return (
        e.crossJoin(F.broadcast(cents))
        .withColumn(
            "_ccos", _cos(F.col("_v"), F.col("_norm"), F.col("_cv"), F.col("_cn"))
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", "_v", "_norm", "cell")
    )


def ivf_topk(
    embs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: search only the ``n_probe`` cells whose
    centroids are nearest each query. Output shape = cosine_topk's.

    The data-side scan touches ~n_probe/n_cells of the vectors (cell
    pruning via the probe-list semi-join); recall depends on quantizer
    quality, which is the standard IVF tradeoff.
    """
    assigned = ivf_assign(embs, n_cells, vec_col, id_col)
    e = with_norm(embs, vec_col).select(F.col(id_col).alias("id"), "_v", "_norm")
    cents = e.orderBy("id").limit(n_cells).select(
        F.col("id").alias("cell"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = e.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("_pcos"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "_pcos", _cos(F.col("_qv"), F.col("_qn"), F.col("_cv"), F.col("_cn"))
        )
        .withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "cell", "_qv", "_qn")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .where(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            _cos(F.col("_qv"), F.col("_qn"), F.col("_v"), F.col("_norm")).alias(
                "cosine"
            ),
        )
    )
    return _ranked_topk(scored, k)
