"""Tests for the multimodal binary-column plumbing (operators/multimodal.py):
the Arrow mapInPandas path with the deterministic fake decode, and the
honest NotImplementedError on the real-decode path."""

import hashlib

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_image_stub,
    extract_image_features,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG...", deterministic_fake=False)


def test_decode_stub_deterministic_fake_known_answer():
    raw = b"hello-bytes"
    h = hashlib.md5(raw).digest()
    w, hh, c = decode_image_stub(raw, deterministic_fake=True)
    assert w == 64 + int.from_bytes(h[0:2], "big") % 1024
    assert hh == 64 + int.from_bytes(h[2:4], "big") % 1024
    assert c == 1 + h[4] % 4
    # stable across calls
    assert decode_image_stub(raw, deterministic_fake=True) == (w, hh, c)


def test_extract_image_features_plumbing(spark):
    rows = [(f"u{i}", bytes([i]) * (10 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_image_features(df, feat_dim=8)
    # schema is the declared typed-metadata contract
    assert out.schema.simpleString() == (
        "struct<url:string,n_bytes:bigint,width:int,height:int,"
        "channels:int,feature:array<float>>"
    )
    got = {r.url: r for r in out.collect()}
    assert len(got) == 20
    for url, raw in rows:
        r = got[url]
        assert r.n_bytes == len(raw)
        w, h, c = decode_image_stub(raw, deterministic_fake=True)
        assert (r.width, r.height, r.channels) == (w, h, c)
        dig = hashlib.md5(raw + b"#feat").digest()
        assert len(r.feature) == 8
        for i, f in enumerate(r.feature):
            assert f == pytest.approx(dig[i] / 255.0, abs=1e-6)
        assert all(0.0 <= f <= 1.0 for f in r.feature)


def test_extract_image_features_distributed_partitions(spark):
    # the UDF must be per-batch pure: same results regardless of partitioning
    rows = [(f"u{i}", bytes([i % 251]) * 64) for i in range(100)]
    df = spark.createDataFrame(rows, "url string, html binary")
    a = sorted(
        (r.url, r.width, r.height) for r in extract_image_features(df).collect()
    )
    b = sorted(
        (r.url, r.width, r.height)
        for r in extract_image_features(df.repartition(7)).collect()
    )
    assert a == b
