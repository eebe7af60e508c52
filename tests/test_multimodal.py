"""Tests for the multimodal binary-column plumbing (operators/multimodal.py):
REAL pure-python BMP/PPM header decode against planted fixture ground
truth, the deterministic md5 fake for opaque payloads, and the Arrow
mapInPandas path."""

import hashlib

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
    decode_image,
    decode_image_stub,
    extract_image_features,
    fake_dims,
)


def test_decode_real_bmp_and_ppm_known_answer():
    import random

    from scrapy_crawler_german_real_estate_sites_spark.sources.synth import (
        bmp_bytes,
        ppm_bytes,
    )

    rng = random.Random(7)
    assert decode_image(bmp_bytes(123, 45, rng)) == (123, 45, 3)
    assert decode_image(ppm_bytes(31, 207, rng)) == (31, 207, 3)
    # PGM (P5, 1 channel) with a comment line
    assert decode_image(b"P5\n# c\n17 9\n255\n" + b"\x00" * (17 * 9)) == (17, 9, 1)
    # non-images refuse to decode
    assert decode_image(b"\x89PNG\r\n\x1a\n...") is None
    assert decode_image(b"<html></html>") is None
    assert decode_image(b"") is None


def test_decode_stub_raises_without_fake():
    with pytest.raises(ValueError):
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


def test_fixture_images_decode_to_ground_truth(spark, fix_tiny):
    """The planted BMP/PPM fixture images decode to their recorded true
    dims through the full Spark mapInPandas path; opaque payloads take the
    md5-fake path and are flagged decoded=false."""
    import os

    df = spark.read.parquet(os.path.join(fix_tiny, "images.parquet"))
    out = {
        r.url: r
        for r in extract_image_features(df, bin_col="img").collect()
    }
    truth = df.select(
        "url", "kind", "true_width", "true_height", "true_channels"
    ).collect()
    assert len(truth) == 32
    assert sum(1 for t in truth if t.kind == "png") == 8
    for t in truth:
        r = out[t.url]
        if t.kind in ("bmp", "ppm", "png"):
            assert r.decoded is True
            assert (r.width, r.height, r.channels) == (
                t.true_width, t.true_height, t.true_channels,
            ), t.url
        else:
            assert r.decoded is False


def test_extract_image_features_plumbing(spark):
    rows = [(f"u{i}", bytes([i]) * (10 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_image_features(df, feat_dim=8)
    # schema is the declared typed-metadata contract
    assert out.schema.simpleString() == (
        "struct<url:string,n_bytes:bigint,width:int,height:int,"
        "channels:int,decoded:boolean,feature:array<float>>"
    )
    got = {r.url: r for r in out.collect()}
    assert len(got) == 20
    for url, raw in rows:
        r = got[url]
        assert r.n_bytes == len(raw)
        w, h, c = fake_dims(raw)
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


# ---------------------------------------------------------------------------
# PNG — real IHDR+IDAT decode (all five filters, palette), filter-0 encode
# ---------------------------------------------------------------------------


def _filtered_png(w, h, ch, pixels, filters):
    """Hand-build a PNG whose scanlines use the GIVEN filter types, by
    applying the forward filters from the spec — so decode_png's
    de-filtering is tested against an independent construction, not just
    its own encoder's filter-0 output."""
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride, bpp = w * ch, ch
    flat = b""
    prev = [0] * stride
    for y in range(h):
        line = [int(v) for v in pixels[y * stride : (y + 1) * stride]]
        f = filters[y]
        enc = []
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc.append((line[i] - pred) & 0xFF)
        flat += bytes([f]) + bytes(enc)
        prev = line

    def chunk(tag, data):
        body = tag + data
        return (len(data).to_bytes(4, "big") + body
                + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, ctype, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(flat)) + chunk(b"IEND", b""))


def test_png_encode_decode_roundtrip():
    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for ch in (1, 2, 3, 4):
        a = rng.integers(0, 256, size=(13, 7, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a), ch
    # 2-d gray input → (h, w, 1) out
    g = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g))[:, :, 0], g)


def test_png_all_filter_types_decode():
    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        decode_png,
    )

    rng = np.random.default_rng(23)
    for ch in (1, 3, 4):
        w, h = 6, 5
        px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8)
        raw = _filtered_png(w, h, ch, list(px), filters=[0, 1, 2, 3, 4])
        got = decode_png(raw)
        assert got is not None and got.shape == (h, w, ch)
        assert np.array_equal(got.reshape(-1), px), f"ch={ch}"


def test_png_palette_decode():
    import zlib

    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        decode_png,
    )

    # 3 palette entries; 4x2 index image
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = [0, 1, 2, 1, 2, 0, 0, 1]
    flat = b"".join(
        b"\x00" + bytes(idx[y * 4 : (y + 1) * 4]) for y in range(2)
    )

    def chunk(tag, data):
        body = tag + data
        return (len(data).to_bytes(4, "big") + body
                + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (4).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
        [8, 3, 0, 0, 0])
    raw = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(flat)) + chunk(b"IEND", b""))
    got = decode_png(raw)
    assert got.shape == (2, 4, 3)
    exp = np.array(
        [[plte[3 * i], plte[3 * i + 1], plte[3 * i + 2]] for i in idx],
        dtype=np.uint8,
    ).reshape(2, 4, 3)
    assert np.array_equal(got, exp)


def test_png_header_real_dims_and_rejects():
    import random

    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        decode_png,
    )
    from scrapy_crawler_german_real_estate_sites_spark.sources.synth import (
        png_bytes,
    )

    rng = random.Random(5)
    assert decode_image(png_bytes(123, 45, rng, channels=3)) == (123, 45, 3)
    assert decode_image(png_bytes(7, 9, rng, channels=1)) == (7, 9, 1)
    assert decode_image(png_bytes(31, 8, rng, channels=4)) == (31, 8, 4)
    # truncated / malformed PNGs refuse (and the stub falls back to fake)
    assert decode_image(b"\x89PNG\r\n\x1a\n...") is None
    assert decode_png(b"\x89PNG\r\n\x1a\n...") is None
    good = png_bytes(10, 10, rng)
    assert decode_png(good[:40]) is None  # truncated mid-IDAT
    # interlaced flag → refuse (documented limit)
    interlaced = bytearray(good)
    interlaced[28] = 1
    assert decode_image(bytes(interlaced)) is None


def test_png_resize_real():
    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        decode_png,
        encode_png,
        resize_png,
    )

    # pixel (x, y) = (x*10 + y, 0, 0): nearest-neighbor picks are exact
    a = np.zeros((2, 4, 3), np.uint8)
    for y in range(2):
        for x in range(4):
            a[y, x, 0] = x * 10 + y
    out = decode_png(resize_png(encode_png(a), 2, 1))
    assert np.array_equal(out, a[[0]][:, [0, 2]])
    assert resize_png(b"P6\n1 1\n255\n\x00\x00\x00", 1, 1) is None


def test_png_resize_spark_path(spark):
    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        decode_png,
        encode_png,
        resize_images,
    )

    a = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [("p", encode_png(a))], "url string, image binary")
    r = resize_images(df, 2, 2).collect()[0]
    assert r.resized is True
    got = decode_png(bytes(r.image))
    assert np.array_equal(got, a[[0, 2]][:, [0, 2]])


# ---------------------------------------------------------------------------
# resize + frame sampling
# ---------------------------------------------------------------------------


def _p6(w, h, pixels):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(pixels)


def test_resize_pnm_known_answer():
    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        resize_pnm,
    )

    # 4x2 rgb image: pixel (x,y) = (x*10+y, 0, 0)
    px = []
    for y in range(2):
        for x in range(4):
            px += [x * 10 + y, 0, 0]
    raw = _p6(4, 2, px)
    # downsample to 2x1: nearest-neighbor picks src (0,0) and (2,0)
    assert resize_pnm(raw, 2, 1) == _p6(2, 1, [0, 0, 0, 20, 0, 0])
    # upsample to 8x2 duplicates columns
    up = resize_pnm(raw, 8, 2)
    assert up[:11] == b"P6\n8 2\n255\n"
    assert up[11:14] == bytes([0, 0, 0]) and up[14:17] == bytes([0, 0, 0])
    # P5 grayscale
    assert resize_pnm(b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4]), 1, 1) == (
        b"P5\n1 1\n255\n" + bytes([1])
    )
    # non-PNM payloads refuse
    assert resize_pnm(b"BMflat-not-pnm", 2, 2) is None
    assert resize_pnm(b"P3\n1 1\n255\n0 0 0", 1, 1) is None  # ascii PNM


def test_resize_images_spark_path(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        resize_images,
        resize_pnm,
    )

    px = bytes(range(4 * 2 * 3))
    rows = [("a", _p6(4, 2, px)), ("b", b"\x89PNG-opaque")]
    df = spark.createDataFrame(rows, "url string, image binary")
    got = {r.url: r for r in resize_images(df, 2, 2).collect()}
    assert got["a"].resized is True
    assert bytes(got["a"].image) == resize_pnm(rows[0][1], 2, 2)
    assert got["b"].resized is False
    assert bytes(got["b"].image) == rows[1][1]  # passthrough
    assert (got["a"].out_w, got["a"].out_h) == (2, 2)


def test_sample_frames_known_answer(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        sample_frames,
    )

    # 10 frames of 4 bytes each + 2 trailing bytes (dropped)
    video = b"".join(bytes([k] * 4) for k in range(10)) + b"zz"
    df = spark.createDataFrame([("v", video)], "url string, video binary")
    got = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in sample_frames(df, frame_bytes=4, every_n=3).collect()
    )
    assert got == [(0, b"\x00" * 4), (3, b"\x03" * 4),
                   (6, b"\x06" * 4), (9, b"\x09" * 4)]
    # every_n=1 yields all complete frames
    assert sample_frames(df, frame_bytes=4).count() == 10


def test_sample_frames_validates_args(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.multimodal import (
        sample_frames,
    )

    df = spark.createDataFrame([("v", b"x")], "url string, video binary")
    with pytest.raises(ValueError):
        sample_frames(df, frame_bytes=0)
    with pytest.raises(ValueError):
        sample_frames(df, frame_bytes=4, every_n=0)
