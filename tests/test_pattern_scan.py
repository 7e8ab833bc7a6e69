from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import pattern_scan as PS


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_email_and_digit_patterns(spark):
    docs = _docs(
        spark,
        [
            "contact a@b.com or c@d.org today",
            "no pii here",
            "serial 1234567 and 7654321",
        ],
    )
    got = {r.pattern_name: r for r in PS.pattern_scan(docs, PS.PII_PATTERNS).collect()}
    assert got["email"].n_docs_with_hit == 1
    assert got["email"].total_hits == 2
    assert got["digit_run"].total_hits == 2
    assert got["phoneish"].total_hits == 0
    assert got["email"].n_docs == 3
    assert abs(got["email"].doc_hit_rate - 1 / 3) < 1e-6


def test_custom_pattern_counts_nonoverlapping(spark):
    docs = _docs(spark, ["aaaa"])
    got = PS.pattern_scan(docs, {"aa": "aa"}).collect()[0]
    assert got.total_hits == 2  # non-overlapping matches


def test_per_doc_hits_projection(spark):
    docs = _docs(spark, ["x 192.168.0.1 y", "z"])
    rows = {r.doc_id: r for r in PS.pattern_hits(docs, PS.PII_PATTERNS).collect()}
    assert rows[0].hits_ipv4 == 1
    assert rows[1].hits_ipv4 == 0
