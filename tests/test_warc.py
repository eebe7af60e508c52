"""WARC source (sources/warc.py): framing round-trip, CC-style gzip
members, truncation tolerance, distributed scan vs ground truth, and the
html→text extraction chain."""

import datetime
import gzip
import os

import pytest

from scrapy_crawler_german_real_estate_sites_spark.sources.warc import (
    html_to_text,
    iter_warc_records,
    pages_from_warc,
    parse_http_response,
    record_bytes,
    warc_fixture,
    warc_scan,
    write_warc,
)

TS = datetime.datetime(2021, 5, 1, 6, 0, 1)
RECS = [
    ("http://a.example/1", TS, "<html><body>eins</body></html>".encode()),
    ("http://a.example/2", TS + datetime.timedelta(seconds=5),
     "<html><body>zwei &amp; drei</body></html>".encode()),
    ("http://b.example/umlaut", TS + datetime.timedelta(microseconds=250),
     "<html><body>Straße</body></html>".encode()),
]


def _records(path):
    with open(path, "rb") as f:
        return list(iter_warc_records(f.read()))


def test_roundtrip_plain_and_gzip(tmp_path):
    for gz in (False, True):
        p = str(tmp_path / f"t{int(gz)}.warc.gz")
        write_warc(p, RECS, gzip_members=gz)
        recs = _records(p)
        # warcinfo leads, then the three responses in order
        assert recs[0]["headers"]["warc-type"] == "warcinfo"
        resp = [r for r in recs if r["headers"]["warc-type"] == "response"]
        assert len(resp) == len(RECS)
        for rec, (url, ts, html) in zip(resp, RECS):
            assert rec["headers"]["warc-target-uri"] == url
            status, hh, body = parse_http_response(rec["payload"])
            assert status == 200
            assert body == html  # byte-identical payload recovery
            assert hh["content-length"] == str(len(html))


def test_gzip_members_are_individually_valid(tmp_path):
    """CC convention: each record its own gzip member — the first member
    alone must decompress to a complete record."""
    p = str(tmp_path / "m.warc.gz")
    write_warc(p, RECS)
    data = open(p, "rb").read()
    # find the second member's magic to isolate the first member
    nxt = data.find(b"\x1f\x8b", 2)
    assert nxt > 0
    first = gzip.decompress(data[:nxt])
    assert first.startswith(b"WARC/1.0")


def test_truncated_tail_keeps_clean_prefix(tmp_path):
    p = str(tmp_path / "t.warc.gz")
    write_warc(p, RECS)
    data = open(p, "rb").read()
    recs_all = list(iter_warc_records(data))
    recs_cut = list(iter_warc_records(data[: len(data) - 40]))
    assert 0 < len(recs_cut) < len(recs_all)
    # every surviving record is intact
    for r in recs_cut:
        assert int(r["headers"]["content-length"]) == len(r["payload"])


def test_non_warc_garbage_yields_nothing():
    assert list(iter_warc_records(b"this is not a warc")) == []
    assert list(iter_warc_records(b"")) == []


def test_html_to_text_chain(spark):
    html = ('<html><head><title>T</title><style>p {x}</style>'
            "<script>var a = '<p>';\nfoo()</script></head>"
            "<body><!-- hidden --><p>Hallo&nbsp;Welt &amp; alle</p>"
            "<div>  mehr\n text </div></body></html>")
    row = spark.createDataFrame([(html,)], "h string").select(
        html_to_text("h").alias("t")
    ).head()
    assert row.t == "T Hallo Welt & alle mehr text"


def test_scan_matches_ground_truth(spark, fix_tiny):
    import pyarrow.parquet as pq

    wdir = warc_fixture(fix_tiny, records_per_file=200)
    exp = pq.read_table(
        os.path.join(fix_tiny, "expected_warc.parquet")
    ).to_pylist()
    got = {
        r["url"]: r
        for r in pages_from_warc(warc_scan(spark, wdir)).collect()
    }
    assert len(got) == len(exp)
    for e in exp:
        g = got[e["url"]]
        assert g["html"] == e["html_str"].encode("utf-8")  # exact bytes
        assert g["warc_ts"] == e["warc_ts"]
        assert g["warc_file"] == e["warc_file"]
        assert g["http_status"] == 200
    # derived columns exist and are sane
    sample = next(iter(got.values()))
    assert sample["lang"] in ("de", "en", "unknown")
    assert "<" not in sample["text"]


def test_scan_is_pure_map(spark, fix_tiny):
    """Ingest must plan with no exchange: scan → Arrow pass → project."""
    wdir = warc_fixture(fix_tiny)
    plan = pages_from_warc(warc_scan(spark, wdir))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_fixture_idempotent(fix_tiny):
    a = warc_fixture(fix_tiny)
    files = sorted(os.listdir(a))
    b = warc_fixture(fix_tiny)
    assert a == b and sorted(os.listdir(b)) == files
