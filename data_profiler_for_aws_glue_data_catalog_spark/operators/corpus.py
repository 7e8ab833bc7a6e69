"""Composed corpus-cleaning pipeline: filter -> dedup in one lazy plan.

The canonical preprocessing chain of a training-data pipeline, expressed
as ONE DataFrame plan so Catalyst fuses it end-to-end:

1. per-row features (map-side, fused into the scan): quality score
   (text_analysis.quality_columns), language prediction
   (text_analysis.lang_pred_column), normalized-content hash;
2. quality + language FILTERS applied before anything shuffles — the
   predicates prune the corpus inside the scan stage, so the dedup
   shuffle only ever moves surviving rows (filter-then-dedup is both the
   cheaper and the semantically standard order: a high-quality duplicate
   of a rejected low-quality doc must survive);
3. exact dedup among survivors: one window over the content hash, keeper
   = smallest id (same semantics as operators/dedup.exact_duplicates).

Total: one scan + one shuffle (the dedup hash partition), regardless of
corpus size. The expression builders are SHARED with the standalone
text_analysis operators, so this composition cannot drift from the
oracle-checked semantics of its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.functions import text as X
from data_profiler_for_aws_glue_data_catalog_spark.operators.text_analysis import (
    lang_pred_column,
    quality_columns,
)


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The cleaned corpus: (id, lang_pred, quality, content_md5) for every
    document that (a) scores >= min_quality, (b) predicts one of
    ``langs``, and (c) is the smallest-id exact duplicate among the
    surviving rows of its normalized content."""
    toks = X.tokens(F.col(text_col))
    t = docs.select(
        F.col(id_col).alias("id"),
        lang_pred_column(toks).alias("lang_pred"),
        X.round6(quality_columns(F.col(text_col), toks)["quality"]).alias(
            "quality"
        ),
        X.md5_hex(X.normalized(F.col(text_col))).alias("content_md5"),
    )
    survivors = t.where(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(*langs)
    )
    w = Window.partitionBy("content_md5")
    return (
        survivors.withColumn("_keep", F.col("id") == F.min("id").over(w))
        .where(F.col("_keep"))
        .drop("_keep")
    )
