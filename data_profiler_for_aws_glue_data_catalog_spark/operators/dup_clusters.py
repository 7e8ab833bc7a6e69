"""Duplicate-cluster resolution: connected components over dup pairs.

The dedup operators (dedup.py) emit PAIRS (doc_a, doc_b). A real
corpus-cleaning pipeline needs CLUSTERS: near-duplication is not
transitive, but keep-one-per-group semantics treat it as if it were, so
the pair graph's connected components are the dedup groups and the
canonical representative is the minimum id in each component.

``duplicate_clusters`` computes min-id labels by iterative label
propagation — the standard Spark structure for small-diameter graph
fixpoints (dup clusters are near-cliques; diameter is almost always
<= 3, so 2-4 rounds converge):

  labels(v) <- min(labels(v), min over neighbors labels(u))

Each round is one equi-join (edges x labels, shuffle on id) + one
min-aggregation. Convergence is detected from a single-row aggregate
(labels only ever DECREASE, so the label sum is a monotone potential:
unchanged sum == fixpoint) — no extra diff join. Lineage is truncated
every round with localCheckpoint so the plan does not grow with
iterations. The fixpoint (min id per component) is unique, hence
engine-reproducible — the DuckDB oracle reaches the same labels with a
recursive CTE instead of a loop.

Scale notes (100 TB): rounds scale with component diameter, not data;
each round shuffles |edges| + |nodes| rows, AQE-handled. For pathological
chain-shaped graphs (diameter ~ n), switch to the large-star/small-star
alternation which converges in O(log n) rounds — not needed for dedup
clusters, whose diameter is bounded by the near-clique structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, cluster_id) for every id in any pair; cluster_id = min id of
    the connected component."""
    from data_profiler_for_aws_glue_data_catalog_spark.plans.partitioning import materialize

    # r9: the pair relation is typically an expensive LSH/verify pipeline,
    # and the symmetrizing union below references it TWICE — materialize
    # once so fwd+rev read stored blocks instead of re-running the
    # candidate join per branch (same rows either way)
    pairs = materialize(pairs.select(id_a, id_b))
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=False)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("label")
        )
        new_labels = (
            labels.select("id", "label")
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("id", F.col("label").alias("cluster_id"))


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Per-document keep/drop verdict: (id, cluster_id, is_keep).

    Documents in no pair are their own singleton cluster (kept); within
    a cluster only the minimum id is kept."""
    clusters = duplicate_clusters(pairs, id_a, id_b)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(clusters, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_keep", F.col("id") == F.col("cluster_id"))
    )


def duplicate_clusters_sql(pairs_sql: str, id_a: str = "doc_a", id_b: str = "doc_b") -> str:
    """DuckDB mirror: recursive reachability, min reachable id per node.

    ``dup_pairs``/``pair_edges`` are MATERIALIZED: the candidate-pair
    relation (often an expensive LSH subquery) is referenced twice to
    symmetrize and then again per recursion step — without the hint DuckDB
    inlines it per reference, which made this oracle minutes-slow at sf0.1
    (the round-5 sweep's only two skips). Components are computed over the
    pre-reduced pair relation only; singleton docs never enter the
    recursion (resolve_duplicates_sql adds them back with a LEFT JOIN)."""
    return f"""
WITH RECURSIVE dup_pairs AS MATERIALIZED ({pairs_sql}),
pair_edges AS MATERIALIZED (
  SELECT {id_a} AS a, {id_b} AS b FROM dup_pairs
  UNION
  SELECT {id_b} AS a, {id_a} AS b FROM dup_pairs
),
reach(id, r) AS (
  SELECT a, a FROM pair_edges
  UNION
  SELECT e.b, reach.r FROM pair_edges e JOIN reach ON reach.id = e.a
)
SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


def resolve_duplicates_sql(
    docs_table: str,
    pairs_sql: str,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> str:
    """DuckDB mirror of resolve_duplicates."""
    return f"""
WITH clusters AS ({duplicate_clusters_sql(pairs_sql, id_a, id_b)})
SELECT d.{id_col} AS id,
  COALESCE(c.cluster_id, d.{id_col}) AS cluster_id,
  d.{id_col} = COALESCE(c.cluster_id, d.{id_col}) AS is_keep
FROM {docs_table} d LEFT JOIN clusters c ON d.{id_col} = c.id
"""


def resolve_duplicates_by_score(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Keep-BEST-per-cluster resolution: like resolve_duplicates, but the
    keeper is the cluster member with the highest ``score_col`` (id
    ascending breaks score ties) — the production dedup policy when a
    quality signal exists ("keep the best copy, not the first copy").

    Output: (id, cluster_id, score, is_keep). One extra window over the
    |docs|-sized labeled relation on top of the component labeling.
    """
    clusters = duplicate_clusters(pairs, id_a, id_b)
    labeled = (
        docs.select(F.col(id_col).alias("id"), F.col(score_col).alias("score"))
        .join(clusters, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
            "score",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("id")
    )
    return (
        labeled.withColumn("__rk", F.row_number().over(w))
        .withColumn("is_keep", F.col("__rk") == 1)
        .drop("__rk")
    )


def resolve_duplicates_by_score_sql(
    docs_table: str,
    pairs_sql: str,
    score_sql: str,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> str:
    """DuckDB mirror; ``score_sql`` yields ({id_col}, score) per doc."""
    return f"""
WITH clusters AS ({duplicate_clusters_sql(pairs_sql, id_a, id_b)}),
scores AS ({score_sql}),
labeled AS (
  SELECT d.{id_col} AS id,
    COALESCE(c.cluster_id, d.{id_col}) AS cluster_id,
    s.score
  FROM {docs_table} d
  LEFT JOIN clusters c ON d.{id_col} = c.id
  JOIN scores s ON d.{id_col} = s.{id_col}
)
SELECT id, cluster_id, score,
  ROW_NUMBER() OVER (
    PARTITION BY cluster_id ORDER BY score DESC, id ASC
  ) = 1 AS is_keep
FROM labeled
"""
