"""Inverted index construction: term -> sorted posting list.

The retrieval-side complement of vocabulary.py: build the classic
search index relation (term, doc_freq, postings[]) from the corpus,
with postings sorted by doc id for deterministic, merge-friendly
output (the layout a keyword-search or BM25 layer consumes).

Plan shape:
1. tokens explode map-side; per-doc DISTINCT (doc, term) pairs via one
   ``groupBy(term, doc)`` — the same combine-friendly shuffle shape as
   vocabulary (never count_distinct over raw pairs);
2. ONE ``groupBy(term)`` builds the posting array with
   ``sort_array(collect_list(doc))`` — exact, deterministic order;
3. ``min_df``/``max_df`` prune BEFORE materializing arrays: stop-word
   terms (df ~ |corpus|) would otherwise produce giant postings — the
   indexing analog of the hot-shingle cap.

Scale notes (100 TB): posting arrays are the O(df) state — max_df
bounds them. For web-scale dfs beyond array comfort, swap the
collect_list for a (term, doc) relation sorted+bucketed by term (the
bucketed sink) and keep this operator for the pruned middle band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INDEX_COLS = ["term", "doc_freq", "postings"]


def inverted_index(
    docs: DataFrame,
    min_df: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, doc_freq, postings sorted-by-doc-id) for terms with
    min_df <= df <= max_df."""
    pairs = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
            ).alias("term"),
        )
        .groupBy("term", "doc")
        .agg(F.lit(1).alias("_one"))
    )
    idx = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sort_array(F.collect_list("doc")).alias("postings"),
    )
    idx = idx.where(F.col("doc_freq") >= min_df)
    if max_df is not None:
        idx = idx.where(F.col("doc_freq") <= max_df)
    return idx.select(*INDEX_COLS)


def inverted_index_sql(
    table: str,
    min_df: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror (list(... ORDER BY doc) = sorted postings)."""
    cap = f"AND COUNT(*) <= {max_df}" if max_df is not None else ""
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc, term FROM (
    SELECT {id_col} AS doc,
      unnest(list_filter(string_split({text_col}, ' '), t -> t <> '')) AS term
    FROM {table}
  )
)
SELECT term, COUNT(*) AS doc_freq,
  list(doc ORDER BY doc) AS postings
FROM pairs
GROUP BY term
HAVING COUNT(*) >= {min_df} {cap}
"""
