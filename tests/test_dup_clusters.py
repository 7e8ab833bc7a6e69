from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.operators import dup_clusters as DC


def _clusters(spark, pair_rows):
    pairs = spark.createDataFrame(pair_rows, "doc_a bigint, doc_b bigint")
    return {
        r.id: r.cluster_id for r in DC.duplicate_clusters(pairs).collect()
    }


def test_single_pair(spark):
    assert _clusters(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_transitive_chain(spark):
    # 1-2, 2-3, 3-4: one component labeled 1 despite no direct 1-4 pair
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components(spark):
    got = _clusters(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges(spark):
    # diameter 8 chain: needs several propagation rounds
    chain = [(i, i + 1) for i in range(1, 9)]
    got = _clusters(spark, chain)
    assert got == {i: 1 for i in range(1, 10)}


def test_resolve_keeps_singletons_and_min_ids(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id bigint")
    pairs = spark.createDataFrame([(2, 4), (4, 5)], "doc_a bigint, doc_b bigint")
    got = {
        r.id: (r.cluster_id, r.is_keep)
        for r in DC.resolve_duplicates(docs, pairs).collect()
    }
    assert got == {
        1: (1, True),
        2: (2, True),
        3: (3, True),
        4: (2, False),
        5: (2, False),
    }


def test_resolve_by_score_keeps_best(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.dup_clusters import (
        resolve_duplicates_by_score,
    )

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.1)], "doc_id bigint, q double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a bigint, doc_b bigint")
    got = {r.id: r for r in resolve_duplicates_by_score(docs, pairs, "q").collect()}
    # cluster {1,2,3}: doc 2 has the best score
    assert got[2].is_keep and not got[1].is_keep and not got[3].is_keep
    assert got[4].is_keep  # singleton
    assert got[1].cluster_id == got[2].cluster_id == got[3].cluster_id
