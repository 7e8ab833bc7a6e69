"""Chunking and vocabulary operators: boundary semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators.chunking import chunk_documents
from data_profiler_for_aws_glue_data_catalog_spark.operators.vocabulary import token_topk


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g"),     # 7 tokens
            (2, "x y"),               # shorter than one chunk
            (3, ""),                  # no tokens -> no chunks
            (4, None),                # null text -> no chunks
        ],
        "doc_id bigint, text string",
    )


def test_chunk_boundaries(spark):
    out = chunk_documents(_docs(spark), chunk_tokens=4, overlap=1)
    got = {
        (r["id"], r["chunk_seq"]): (r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # stride 3: starts 1, 4, 7 for doc 1
    assert got == {
        (1, 0): (4, "a b c d"),
        (1, 1): (4, "d e f g"),
        (1, 2): (1, "g"),
        (2, 0): (2, "x y"),
    }


def test_chunk_no_overlap(spark):
    out = chunk_documents(_docs(spark), chunk_tokens=3, overlap=0)
    one = sorted(
        (r["chunk_seq"], r["chunk_text"])
        for r in out.where(F.col("id") == 1).collect()
    )
    assert one == [(0, "a b c"), (1, "d e f"), (2, "g")]


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark), chunk_tokens=4, overlap=4)


def test_token_topk_ranks_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a c"), (2, "a b z")],
        "doc_id bigint, text string",
    )
    rows = token_topk(docs, k=3).collect()
    got = [(r["token"], r["occurrences"], r["doc_freq"], r["rank"]) for r in rows]
    # a and b tie at 3 occurrences -> token ASC breaks the tie
    assert got == [("a", 3, 2, 1), ("b", 3, 2, 2), ("c", 1, 1, 3)]


def test_tfidf_values(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.tfidf import tfidf
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")],
        "doc_id bigint, text string",
    )
    got = {
        (r["id"], r["token"]): (r["tf"], r["doc_freq"], r["tfidf"])
        for r in tfidf(docs).collect()
    }
    # token a: df=2, N=3; doc 1 tf=2
    assert got[(1, "a")][0] == 2 and got[(1, "a")][1] == 2
    assert abs(got[(1, "a")][2] - round(2 * math.log(3 / 2), 6)) < 1e-9
    # token b: df=1 -> idf=ln(3)
    assert abs(got[(1, "b")][2] - round(math.log(3.0), 6)) < 1e-9
    # min_doc_freq=2 drops hapaxes b
    pruned = tfidf(docs, min_doc_freq=2)
    assert {r["token"] for r in pruned.collect()} == {"a", "c"}
