"""Deterministic weighted sampling without replacement (A-ExpJ style).

Importance-weighted corpus subsetting — "sample 10k docs proportional to
quality score" — reproducibly: the Efraimidis–Spirakis key
``u^(1/w)`` (u uniform) makes weighted sampling a plain top-k, and
deriving u from a seeded hash of the id makes it DETERMINISTIC — the
same (id, weight, seed) always wins or loses, independent of
partitioning, re-runs, or cluster size (the property sampling.py's
unweighted samplers already guarantee).

Plan shape: map-side key computation + one TakeOrderedAndProject
(top-k, no global sort). Determinism across engines: u is a 32-bit
md5-derived uniform, the key is ROUND12'd before ranking and ties break
on id, so the selected set is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.functions.text import M32

ROUND12 = "floor(({x}) * 1000000000000.0 + 0.5) / 1000000000000.0"

WEIGHTED_COLS = ["id", "weight", "key"]


def _u01_sql(id_sql: str, seed: int) -> str:
    """(0,1] uniform from the first 8 hex digits of md5(seed|id) — the
    engine's standard seeded-hash construction (functions/text.py);
    Spark side decodes the hex via conv()."""
    h = f"md5(concat('{seed}|', cast({id_sql} AS string)))"
    return (
        f"(cast(conv(substring({h}, 1, 8), 16, 10) AS double) + 1.0)"
        f" / {float(M32)!r}"
    )


def _u01_duck(id_sql: str, seed: int) -> str:
    h = f"md5('{seed}|' || CAST({id_sql} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(CAST({terms} AS DOUBLE) + 1.0) / {float(M32)!r}"


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Top-k rows by the Efraimidis–Spirakis key ``u^(1/w)`` (weights must
    be > 0; rows with NULL/non-positive weight are excluded). Returns
    (id, weight, key), key descending."""
    base = df.where(F.col(weight_col) > 0).select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    u = _u01_sql("id", seed)
    keyed = base.selectExpr(
        "id",
        "weight",
        f"cast({ROUND12.format(x=f'power({u}, 1.0 / weight)')} AS double) AS key",
    )
    return keyed.orderBy(F.desc("key"), F.asc("id")).limit(k)


def weighted_sample_sql(
    table: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB mirror of :func:`weighted_sample`."""
    u = _u01_duck("id", seed)
    return f"""
WITH base AS (
  SELECT {id_col} AS id, CAST({weight_col} AS DOUBLE) AS weight
  FROM {table} WHERE {weight_col} > 0
),
keyed AS (
  SELECT id, weight,
    CAST({ROUND12.format(x=f'power({u}, 1.0 / weight)')} AS DOUBLE) AS key
  FROM base
)
SELECT id, weight, key FROM keyed ORDER BY key DESC, id ASC LIMIT {k}
"""
