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
    """Eagerly materialize a shared expensive subtree so it is computed
    exactly ONCE.

    A lazy ``persist()`` alone is not enough when the consumers are
    *concurrent*: AQE submits independent stage futures (both sides of a
    self-join, a broadcast build, a subquery) at the same time, and every
    one of them finds the cache unpopulated and recomputes the subtree —
    measured at sf0.1 this multiplies the dominant map stage 2-4x. Same
    pattern a 100 TB pipeline uses: checkpoint the inverted index /
    signature / normed-vector relation, then fan out.

    ``localCheckpoint(eager=True)`` rather than ``persist()+count()``:
    a persisted relation lives in the session's CacheManager until an
    explicit unpersist — and operators cannot unpersist, because their
    lazy result still references the subtree when they return. In a
    long-lived session (a 181-query bench loop, a profiling service)
    those entries accumulate without bound; checkpoint blocks are instead
    reclaimed once the result frame is dereferenced. Lineage truncation
    also FAILS the job on block loss instead of silently recomputing a
    subtree whose outputs (e.g. pinned partition ids) must not change —
    recompute-different-answers is the worse failure mode here.
    """
    return df.localCheckpoint(eager=True)


def partitioned_prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    num_partitions: int | None = None,
    small_threshold: int = 1_000_000,
) -> DataFrame:
    """Distributed prefix sums: for each ``c`` in ``sum_cols`` add
    ``cum_<c>`` = sum of c over all rows with order_col <= this row's
    (in ``order_col`` order, including the row itself).

    A plain ``Window.orderBy(order_col)`` computes this on ONE task — the
    classic single-partition-window scale killer for rank/CDF operators.
    This is the textbook two-phase alternative:

      1. range-repartition by ``order_col`` (keeps order across
         partitions, equal keys co-located);
      2. per-partition local cumsums (window partitioned by the physical
         partition id — parallel across partitions);
      3. per-partition totals collected to the driver (one tiny row per
         partition), turned into a broadcast offset map added map-side.

    Output values are INDEPENDENT of where the sampled range boundaries
    fall (offsets are computed from the actual partition sums), so the
    result is deterministic even though RangePartitioner samples. Input
    rows must be unique in ``order_col`` (pre-aggregate first — every
    caller here feeds a ``groupBy(value)`` frequency relation).

    ADAPTIVE: below ``small_threshold`` rows the plain single-partition
    window wins (the two-phase plan pays ~6 extra jobs + a driver
    collect; a 1M-row sorted window is a sub-second single task) — the
    distributed path engages only when the distinct relation is actually
    data-sized. Both paths produce identical values.
    """
    from pyspark.sql import Window, functions as F

    if df.count() <= small_threshold:
        w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
        return df.select(
            "*", *[F.sum(c).over(w).alias(f"cum_{c}") for c in sum_cols]
        )

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = materialize(parted)  # pin pids: both consumers must agree
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.select(
        "*", *[F.sum(c).over(w).alias(f"_lc_{c}") for c in sum_cols]
    )
    totals = (
        parted.groupBy("_pid")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()
    )
    offsets: dict[str, dict[int, int]] = {c: {} for c in sum_cols}
    for c in sum_cols:
        acc = 0
        for r in sorted(totals, key=lambda r: r["_pid"]):
            offsets[c][r["_pid"]] = acc
            acc += r[c] or 0
    out = local
    for c in sum_cols:
        m = F.create_map(
            *[x for pid, off in sorted(offsets[c].items())
              for x in (F.lit(pid), F.lit(off))]
        )
        out = out.withColumn(
            f"cum_{c}",
            (F.coalesce(F.element_at(m, F.col("_pid")), F.lit(0))
             + F.col(f"_lc_{c}")),
        )
    return out.drop("_pid", *[f"_lc_{c}" for c in sum_cols])
