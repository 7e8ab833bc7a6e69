from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (0, b"hello world"),
        (1, b"hello world"),          # exact dup of 0
        (2, b"\x00\x01\x02\xff"),     # non-UTF8 bytes
        (3, b""),                     # empty payload
        (4, None),                    # NULL payload
        (5, b"unique"),
    ]
    return spark.createDataFrame(rows, "id bigint, payload binary")


def test_binary_scan_metrics(payloads):
    m = {
        r["name"]: r["value"]
        for r in MM.binary_scan_metrics(payloads, "payload").collect()
    }
    assert m["Completeness"] == 5 / 6
    assert m["MaxByteLength"] == 11.0
    assert m["MinByteLength"] == 0.0
    assert m["SumBytes"] == 11 + 11 + 4 + 0 + 6
    assert abs(m["MeanByteLength"] - 32 / 5) < 1e-12


def test_binary_fingerprints_md5(payloads):
    fp = {r["id"]: r for r in MM.binary_fingerprints(payloads, "id", "payload").collect()}
    assert fp[0]["digest"] == hashlib.md5(b"hello world").hexdigest()
    assert fp[0]["digest"] == fp[1]["digest"]
    assert fp[2]["digest"] == hashlib.md5(b"\x00\x01\x02\xff").hexdigest()
    assert fp[4]["digest"] is None
    assert fp[3]["n_bytes"] == 0


def test_binary_duplicate_groups(payloads):
    groups = MM.binary_duplicate_groups(payloads, "id", "payload").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_copies"] == 2 and g["keeper_id"] == 0 and g["n_bytes"] == 11


def test_decode_features_fake(payloads):
    feats = {r["id"]: r for r in MM.decode_features(payloads, "id", "payload").collect()}
    assert len(feats) == 6
    r = feats[0]
    assert r["n_bytes"] == 11
    assert r["width"] == 1 + 11 % 512
    assert r["height"] == 1 + (11 * 7) % 512
    assert r["channels"] == 3
    expected_mean = sum(b"hello world") / 11
    assert abs(r["mean_byte"] - expected_mean) < 1e-12
    # NULL payload decodes as the empty payload (plumbing never crashes)
    assert feats[4]["n_bytes"] == 0 and feats[4]["mean_byte"] == 0.0


def test_decode_features_partitioned(payloads):
    # the mapInPandas stage preserves partition parallelism: results are
    # identical across partitionings
    a = sorted(
        MM.decode_features(payloads, "id", "payload").collect(),
        key=lambda r: r["id"],
    )
    b = sorted(
        MM.decode_features(payloads.repartition(4), "id", "payload").collect(),
        key=lambda r: r["id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_decode_pillow_gated(payloads):
    with pytest.raises(NotImplementedError):
        MM.decode_features(payloads, "id", "payload", decoder="pillow")


def test_no_payload_in_shuffle_plan(payloads):
    # dedup shuffles fingerprints only: the exchange must not carry the
    # payload column
    plan = (
        MM.binary_duplicate_groups(payloads, "id", "payload")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the shuffled row is the partial aggregate's output — fingerprints only
    partial = next(l for l in plan.splitlines() if "partial_count" in l)
    assert "payload" not in partial, partial


def test_frame_sample_windows(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.multimodal import frame_sample

    import hashlib

    payload = bytes(range(64))
    df = spark.createDataFrame([(1, bytearray(payload)), (2, None)], "id bigint, p binary")
    rows = frame_sample(df, "id", "p", n_frames=4, frame_len=16).collect()
    assert [r.frame_offset for r in rows] == [0, 16, 32, 48]
    assert all(r.frame_len == 16 for r in rows)
    assert rows[0].frame_md5 == hashlib.md5(payload[0:16]).hexdigest()
    assert {r.id for r in rows} == {1}  # NULL payload emits nothing


def test_frame_sample_short_payload(spark):
    from data_profiler_for_aws_glue_data_catalog_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame([(1, bytearray(b"abc"))], "id bigint, p binary")
    rows = frame_sample(df, "id", "p", n_frames=4, frame_len=16).collect()
    # offsets 0,0,1,2 -> chunks 'abc','abc','bc','c'
    assert [r.frame_len for r in rows] == [3, 3, 2, 1]
