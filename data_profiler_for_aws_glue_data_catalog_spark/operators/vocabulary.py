"""Corpus vocabulary statistics: token frequency top-k.

Vocabulary building for a tokenizer/LM pipeline: the k most frequent
tokens across the corpus with their occurrence and document frequencies.

Plan shape (the word-count-with-df classic, fully scalable):

1. explode tokens, pre-aggregate per (token, doc) — the heavy shuffle
   moves one row per distinct (token, doc) pair, with map-side partial
   aggregation collapsing within-doc repeats before the exchange;
2. aggregate per token: occurrences = sum of per-doc counts,
   doc_freq = pair count — a much smaller second shuffle (distinct
   tokens);
3. deterministic top-k: (occurrences DESC, token ASC) via
   orderBy+limit -> TakeOrderedAndProject, never a global sort.

Computing doc_freq as COUNT(DISTINCT doc) in a single aggregation would
plan an Expand over the exploded stream (duplicating it); the two-level
groupBy gets the same result with ordinary partial aggregation at every
step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.functions import text as X


def token_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, occurrences, doc_freq, rank 1..k), rank ordered by
    (occurrences DESC, token ASC) — ties at the boundary resolve
    deterministically, so the k-set is engine-reproducible."""
    pairs = (
        docs.select(F.col(id_col).alias("id"), X.tokens(F.col(text_col)).alias("_toks"))
        .select("id", F.explode("_toks").alias("token"))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = pairs.groupBy("token").agg(
        F.sum("cnt").alias("occurrences"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    # rank over the k survivors only (k rows, one tiny partition) — the
    # heavy ranking work is the TakeOrderedAndProject underneath
    w = Window.orderBy(F.desc("occurrences"), F.asc("token"))
    return (
        vocab.orderBy(F.desc("occurrences"), F.asc("token"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
