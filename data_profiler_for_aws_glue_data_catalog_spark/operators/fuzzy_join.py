"""Blocked fuzzy (edit-distance) similarity join for entity resolution.

Finds near-matching string pairs ("Jon Smith" ~ "John Smith") without
the all-pairs explosion: candidates generate ONLY within a blocking
key (equi-join), then the exact Levenshtein filter verifies — the
standard blocking-and-verification shape of record linkage (public
textbook method; same candidates-then-verify discipline as the
MinHash-LSH dedup path).

Plan shape: map-side blocking key, ONE self equi-join on the block,
``levenshtein`` (built-in JVM expression) as the join filter, id
ordering dedups pair orientation. Pair volume = sum over blocks of
C(block size, 2) — the blocking key's job is to bound that; the
default key (first char + length bucket) guarantees candidates agree
on both, which any pair within distance <= 2 of equal-prefix names
usually does (blocking recall is a documented tradeoff, not silent).

Scale notes (100 TB): block sizes are the scale knob (like IVF cell
counts); AQE skew-join splits hot blocks. Levenshtein cost is
O(len^2) per candidate — cap value length upstream for long strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FUZZY_COLS = ["id1", "id2", "value1", "value2", "distance"]


def default_block(col: Column, len_bucket: int = 4) -> Column:
    """first char + length bucket — cheap, order-preserving-ish blocking."""
    return F.concat(
        F.substring(col, 1, 1),
        F.lit("|"),
        F.floor(F.length(col) / len_bucket).cast("string"),
    )


def suffix_token_block(col: Column) -> Column:
    """last whitespace token — right when edits concentrate in the head
    ("cold ring" ~ "old ring"); the complementary pass to prefix
    blocking (real linkage runs several passes and unions candidates)."""
    return F.substring_index(col, " ", -1)


def fuzzy_join(
    df: DataFrame,
    id_col: str,
    value_col: str,
    max_distance: int = 2,
    len_bucket: int = 4,
    block_mode: str = "prefix",
) -> DataFrame:
    """(id1, id2, value1, value2, distance) for same-block pairs with
    Levenshtein distance in [1, max_distance] (exact equals excluded —
    that's dedup_exact's job). ``block_mode``: 'prefix' (first char +
    length bucket) or 'suffix_token' (last word)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(value_col).cast("string").alias("val"),
    ).where(F.col("val").isNotNull())
    blk = (
        suffix_token_block(F.col("val"))
        if block_mode == "suffix_token"
        else default_block(F.col("val"), len_bucket)
    )
    blocked = base.withColumn("blk", blk)
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id1"),
        F.col("b.id").alias("id2"),
        F.col("a.val").alias("value1"),
        F.col("b.val").alias("value2"),
        F.levenshtein(F.col("a.val"), F.col("b.val")).alias("distance"),
    )
    return pairs.where(
        (F.col("distance") >= 1) & (F.col("distance") <= max_distance)
    ).select(*FUZZY_COLS)


def fuzzy_join_sql(
    table: str,
    id_col: str,
    value_col: str,
    max_distance: int = 2,
    len_bucket: int = 4,
    block_mode: str = "prefix",
) -> str:
    """DuckDB mirror (levenshtein() is the same classic edit distance)."""
    if block_mode == "suffix_token":
        blk = "list_extract(string_split(val, ' '), -1)"
    else:
        blk = (
            "substring(val, 1, 1) || '|' || "
            f"CAST(CAST(FLOOR(length(val) / {len_bucket}) AS BIGINT) AS VARCHAR)"
        )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, CAST({value_col} AS VARCHAR) AS val
  FROM {table} WHERE {value_col} IS NOT NULL
),
blocked AS (
  SELECT id, val, {blk} AS blk
  FROM base
)
SELECT a.id AS id1, b.id AS id2, a.val AS value1, b.val AS value2,
  levenshtein(a.val, b.val) AS distance
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
WHERE levenshtein(a.val, b.val) BETWEEN 1 AND {max_distance}
"""
