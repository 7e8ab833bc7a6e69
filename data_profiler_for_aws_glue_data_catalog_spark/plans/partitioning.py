"""Partitioning guards for CPU-heavy plans.

Spark parallelizes a file scan by *splits* (row groups for parquet); a table
stored as one or few row groups — small files, single-file test tables,
badly-written upstream data — runs every downstream narrow transformation on
that many cores, no matter how big the cluster is. For scan-bound work that
is fine; for expression-heavy operators (shingling, hashing, SimHash bit
folds, vector math) it serializes the real cost.

``ensure_parallelism`` inserts ONE explicit round-robin repartition when (and
only when) the plan's scan parallelism is below the cluster default. At
100 TB the input has thousands of natural splits and this is a no-op; on a
single-row-group table it converts a serial stage into a full-width one for
the price of shuffling the (projected) input once — which the downstream
compute dominates. The explicit partition count is deliberately NOT left to
AQE: AQE's coalescing targets shuffle *bytes* (64 MB advisory) and would
collapse a small-but-CPU-expensive stage back to one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Repartition ``df`` to cluster default parallelism if it has fewer
    partitions; otherwise return it unchanged.

    Call it on the *narrowest projection* that feeds the expensive
    expressions, so the one-time shuffle moves as few bytes as possible.
    ``multiple`` widens the target for stages whose per-row cost is extreme.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def materialize(df: DataFrame) -> DataFrame:
    """Persist + eagerly populate: guarantees a shared expensive subtree is
    computed exactly ONCE.

    A lazy ``persist()`` alone is not enough when the consumers are
    *concurrent*: AQE submits independent stage futures (both sides of a
    self-join, a broadcast build, a subquery) at the same time, and every
    one of them finds the cache unpopulated and recomputes the subtree —
    measured at sf0.1 this multiplies the dominant map stage 2-4x. The
    eager count pays one extra pass over the (small) persisted relation and
    removes all recompute. Same pattern a 100 TB pipeline uses: checkpoint
    the inverted index / signature / normed-vector relation, then fan out.
    """
    df = df.persist()
    df.count()
    return df
