"""PageRank over a weighted edge list — iterative DataFrame algorithm.

Graph centrality for the engine's derived graphs: rank event types by
their position in the user-journey transition graph
(operators/transitions.py), pages by click flux, entities by resolution-
graph connectivity. Weighted PageRank (Brin & Page 1998, public):

    r'(v) = (1-d)/N + d * ( sum_{(u,v) in E} w_uv / W_u * r(u)
                            + dangling_mass / N )

with damping ``d``, out-weight totals ``W_u``, and the rank mass of
dangling nodes (no out-edges) redistributed uniformly.

Execution shape: the edge relation is joined to the current rank vector
on src (shuffle on src, or broadcast when the rank vector is small —
ranks are |nodes|-sized, tiny for type-level graphs, data-sized for
entity graphs), contributions aggregate on dst. A FIXED iteration count
unrolls into one lazy plan; each iteration's rank frame is
``materialize()``d to truncate lineage (at 100 TB the per-iteration
checkpoint is mandatory — an unrolled 10-join lineage recomputes
everything on every action and breaks AQE stage reuse).

Determinism: per-edge contributions are floor-ROUND12'd doubles
accumulated as DECIMAL(27,12) (order-free sums); each iteration's rank
is ROUND12'd, so the fixed-point trajectory is bit-identical across
engines — the oracle unrolls the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.plans.partitioning import materialize

ROUND12 = "floor(({x}) * 1000000000000.0 + 0.5) / 1000000000000.0"
DEC12 = "decimal(27,12)"

PAGERANK_COLS = ["node", "rank", "n_nodes"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(node, rank, n_nodes) after ``iterations`` weighted-PageRank steps
    from the uniform vector. Ranks sum to ~1 (exact up to ROUND12)."""
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    ).where(F.col("w") > 0)
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    # NB: alias must not collide with "w" under Spark's case-insensitive
    # resolution (W == w), hence "_ow"
    outw = e.groupBy("src").agg(
        F.sum(F.expr(f"cast(w AS {DEC12})")).cast("double").alias("_ow")
    )
    # normalized edge weight: fixed double shape, mirrored in the oracle
    en = materialize(
        e.join(outw, "src").select(
            "src", "dst", F.expr(f"cast({ROUND12.format(x='w / _ow')} AS double)").alias("p")
        )
    )
    ranks = nodes.select(
        "node", F.lit(float(1.0) / n_nodes).alias("rank")
    )
    # the DANGLING SET is static (nodes without out-edges); only its rank
    # mass changes per iteration — precompute it once instead of planning
    # an anti-join every round
    dangling_nodes = materialize(
        nodes.join(outw, nodes.node == outw.src, "left_anti").select("node")
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            en.join(ranks, en.src == ranks.node)
            .select(
                "dst",
                F.expr(f"cast({ROUND12.format(x='p * rank')} AS double)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum(F.expr(f"cast(c AS {DEC12})")).cast("double").alias("s"))
        )
        dangling = (
            ranks.join(F.broadcast(dangling_nodes), "node", "leftsemi")
            .agg(
                F.coalesce(
                    F.sum(F.expr(f"cast(rank AS {DEC12})")).cast("double"),
                    F.lit(0.0),
                ).alias("dm")
            )
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left_outer")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    "cast("
                    + ROUND12.format(
                        x=f"cast({base!r} AS double) + cast({damping!r} AS double)"
                        f" * (coalesce(s, cast(0.0 AS double)) + dm / {n_nodes})"
                    )
                    + " AS double)"
                ).alias("rank"),
            )
            # truncate lineage: the next iteration references THIS frame
            # twice; without a checkpoint the plan doubles per iteration
            .localCheckpoint()
        )
    return ranks.select("node", "rank", F.lit(n_nodes).alias("n_nodes"))


def pagerank_sql(
    edges_sql: str,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    damping: float = 0.85,
    iterations: int = 10,
) -> str:
    """DuckDB mirror: the same iterations unrolled as chained CTEs.

    Every CTE is AS MATERIALIZED — DuckDB inlines plain CTEs, and the
    rank recurrence references its predecessor twice, so un-materialized
    unrolling re-expands the edge subquery ~2^k times (the exact dual of
    the Spark-side lineage blowup that localCheckpoint cuts)."""
    r12 = lambda x: ROUND12.format(x=x)
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT CAST({src_col} AS VARCHAR) AS src, CAST({dst_col} AS VARCHAR) AS dst,
         CAST({weight_col} AS DOUBLE) AS w
  FROM ({edges_sql}) WHERE {weight_col} > 0
)""",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)",
        f"""outw AS MATERIALIZED (
  SELECT src, CAST(SUM(CAST(w AS DECIMAL(27,12))) AS DOUBLE) AS W
  FROM e GROUP BY src
)""",
        f"en AS MATERIALIZED (SELECT e.src, e.dst, CAST({r12('e.w / o.W')} AS DOUBLE) AS p "
        "FROM e JOIN outw o ON e.src = o.src)",
        "r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank"
        " FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        prev = f"r{i - 1}"
        ctes.append(f"""c{i} AS MATERIALIZED (
  SELECT en.dst,
    CAST(SUM(CAST(CAST({r12('en.p * r.rank')} AS DOUBLE) AS DECIMAL(27,12))) AS DOUBLE) AS s
  FROM en JOIN {prev} r ON en.src = r.node GROUP BY en.dst
)""")
        ctes.append(f"""d{i} AS MATERIALIZED (
  SELECT COALESCE(CAST(SUM(CAST(r.rank AS DECIMAL(27,12))) AS DOUBLE), 0.0) AS dm
  FROM {prev} r WHERE r.node NOT IN (SELECT src FROM outw)
)""")
        # 1-d is computed in PYTHON on the Spark side (embedded literal);
        # repr-embed the same double here so both engines divide the same
        # numerator (DuckDB's decimal 1.0-0.85 would differ in the last ulp)
        step = (
            f"CAST({(1.0 - damping)!r} AS DOUBLE) / (SELECT n FROM nn)"
            f" + CAST({damping!r} AS DOUBLE) * "
            f"(COALESCE(c.s, CAST(0.0 AS DOUBLE)) + d{i}.dm / (SELECT n FROM nn))"
        )
        ctes.append(f"""r{i} AS MATERIALIZED (
  SELECT n.node, CAST({r12(step)} AS DOUBLE) AS rank
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst CROSS JOIN d{i}
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank, (SELECT n FROM nn) AS n_nodes FROM r{iterations}"
    )
