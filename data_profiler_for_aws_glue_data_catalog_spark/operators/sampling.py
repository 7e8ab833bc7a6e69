"""Deterministic sampling and dataset splitting.

Training-data pipelines need samples and train/test splits that are
REPRODUCIBLE across runs, engines and cluster layouts — ``df.sample()``
is none of those (seeded per partition: the sample changes whenever
partitioning does). These operators derive a uniform hash bucket from the
ROW IDENTITY instead:

    bucket(id) = first-32-hex-bits of md5(seed || id)  in  [0, 2^32)

and keep a row iff its bucket clears the rate threshold. Properties:

- deterministic under repartition/shuffle/re-run (pure function of id);
- map-side only — a filter fused into the scan, no shuffle, no sort,
  sampling 100 TB costs one scan;
- consistent across tables: the same (seed, id) always lands on the same
  side, so a split made on `documents` implies the matching split of any
  table keyed by doc_id (sample pushdown via semi-join on the kept ids);
- stratified rates are just a per-stratum threshold on the same bucket.

The md5-derived bucket is mirrored expression-for-expression by the
DuckDB oracle (oracle_ext.sample_sql), so sampling is oracle-checked
value-exact like every other operator — a property engine-seeded RNG
sampling cannot offer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.functions.text import M32, hex32_to_long

SPLIT_COL = "split"


def hash_bucket(id_col: Column, seed: int = 0) -> Column:
    """Uniform bucket in [0, 2^32) from md5(seed || id) — the shared
    primitive of every sampling operator here."""
    return hex32_to_long(
        F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string")))
    )


def _threshold(rate: float) -> int:
    return int(rate * M32)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by id hash — same rows every run,
    every partitioning, every engine."""
    return df.where(hash_bucket(F.col(id_col), seed) < _threshold(rate))


def train_test_split(
    df: DataFrame,
    test_rate: float = 0.2,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Adds a ``split`` column ('test' for ~test_rate of rows, else
    'train'). One map-side projection; rows never move."""
    is_test = hash_bucket(F.col(id_col), seed) < _threshold(test_rate)
    return df.withColumn(
        SPLIT_COL, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. rebalance languages): keep a row
    iff its bucket clears ITS stratum's threshold. Still one map-side
    filter — the rate table is a literal CASE, no join."""
    bucket = hash_bucket(F.col(id_col), seed)
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_threshold(rate))
        ).otherwise(thr)
    return df.where(bucket < thr)


def sample_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen by the same
    deterministic id hash (uniform within each group).

    Rate-based sampling can't promise exact per-class counts; balanced
    eval sets and few-shot pools need them. One window shuffle keyed by
    the group; the (bucket, id) ordering makes the pick reproducible
    across runs, partitionings and engines — the id tie-break covers
    the (vanishing) chance of bucket collisions.

    Scale notes (100 TB): rank-k per key via window top-k; group skew is
    the usual top-k caveat — for pathological single-group corpora,
    pre-filter with deterministic_sample at ~k/|group| first to bound
    the window's input.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def sample_quotas(
    df: DataFrame,
    quotas: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exact per-group QUOTAS (mixture construction): group g keeps its
    quotas[g] hash-ranked rows; unlisted groups are dropped. The
    deterministic generalization of sample_per_group for building
    fixed-composition training mixtures ("500 en, 200 de, 100 fr").

    Same single window shuffle as sample_per_group; the quota lookup is
    a literal CASE, no join.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    quota: Column = F.lit(0)
    for value, k in sorted(quotas.items()):
        quota = F.when(F.col(group_col) == value, F.lit(k)).otherwise(quota)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )
