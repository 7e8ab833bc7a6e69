"""Document chunking: fixed-size token windows with overlap.

The standard preprocessing step between raw documents and an LLM training/
embedding pipeline: split each document into chunks of ``chunk_tokens``
tokens, consecutive chunks overlapping by ``overlap`` tokens (context
continuity across chunk boundaries).

Built entirely from array expressions over the shared tokenizer
(functions.text.tokens): per document, the start positions are
``sequence(1, n_tokens, chunk_tokens - overlap)`` and each chunk is a
``slice`` of the token array — ``posexplode`` emits (chunk_seq, chunk).
All map-side: chunking 100 TB of documents is one scan with zero
shuffles, and chunks inherit the input partitioning (downstream dedup or
embedding stages decide their own keying).

Determinism: chunk boundaries are a pure function of the token sequence —
no randomness, no partition dependence; the DuckDB oracle mirrors the
slicing arithmetic exactly (oracle_ext.chunk_documents_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.functions import text as X


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_seq, n_tokens, chunk_text) — one row per chunk.

    ``chunk_seq`` is 0-based in document order; the final chunk may be
    shorter than ``chunk_tokens``; documents with no tokens yield no
    chunks. ``overlap`` must be < ``chunk_tokens`` (the stride
    ``chunk_tokens - overlap`` must advance).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = X.tokens(F.col(text_col))
    t = docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    starts = F.when(
        F.size("_toks") > 0,
        F.sequence(F.lit(1), F.size("_toks"), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
    return (
        t.select("id", "_toks", F.posexplode(starts).alias("_seq", "_start"))
        .select(
            "id",
            F.col("_seq").cast("int").alias("chunk_seq"),
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
