"""Magic-byte MIME sniffing (functions/sniff.py): known-answer for every
branch, incl. the WEBP two-window check and the octet-stream fallback."""

import gzip

from scrapy_crawler_german_real_estate_sites_spark.functions.sniff import (
    sniff_mime,
)

CASES = [
    (b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "image/png"),
    (b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    (b"GIF87atail", "image/gif"),
    (b"GIF89atail", "image/gif"),
    (b"BM" + b"\x00" * 20, "image/bmp"),
    (b"RIFF\x00\x01\x02\x03WEBPVP8 ", "image/webp"),
    (b"RIFF\x00\x01\x02\x03WAVEfmt ", "application/octet-stream"),  # wav
    (b"%PDF-1.7\n", "application/pdf"),
    (gzip.compress(b"x"), "application/gzip"),
    (b"PK\x03\x04zipzip", "application/zip"),
    (b"P5\n2 2\n255\n" + b"\x00" * 4, "image/x-portable-graymap"),
    (b"P6\n1 1\n255\n\x00\x00\x00", "image/x-portable-pixmap"),
    (b"WARC/1.0\r\nWARC-Type: x", "application/warc"),
    (b"<!DOCTYPE html><html>", "text/html"),
    (b"<!doctype html><html>", "text/html"),
    (b"<html><body>x</body>", "text/html"),
    (b"<HTML>", "text/html"),
    (b'<?xml version="1.0"?>', "text/xml"),
    (b"\x00\x01\x02random", "application/octet-stream"),
    (b"", "application/octet-stream"),
    (b"plain text here", "application/octet-stream"),
]


def test_known_answers(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, b binary")
    got = {r.i: r.mime
           for r in df.select("i", sniff_mime(df.b).alias("mime")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw[:12], got[i], want)


def test_fixture_images_classified(spark, fix_tiny):
    import os

    df = spark.read.parquet(os.path.join(fix_tiny, "images.parquet"))
    rows = df.select("kind", sniff_mime(df.img).alias("mime")).collect()
    expect = {"bmp": "image/bmp", "ppm": "image/x-portable-pixmap",
              "png": "image/png"}
    for r in rows:
        if r.kind in expect:
            assert r.mime == expect[r.kind], (r.kind, r.mime)
        else:
            assert r.mime == "application/octet-stream"
