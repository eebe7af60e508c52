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


# ---------------------------------------------------------------------------
# offset-split reader (warc_scan_ranges)
# ---------------------------------------------------------------------------


def _many_recs(n):
    return [
        (f"http://seg.example/{i:04d}", TS + datetime.timedelta(seconds=i),
         f"<html><body>doc {i} körper</body></html>".encode())
        for i in range(n)
    ]


def test_writer_idx_matches_member_boundaries(tmp_path):
    from scrapy_crawler_german_real_estate_sites_spark.sources.warc import (
        build_member_index,
    )

    p = str(tmp_path / "seg.warc.gz")
    write_warc(p, _many_recs(20))
    with open(p + ".idx") as f:
        idx = [tuple(map(int, ln.split())) for ln in f]
    assert idx == build_member_index(p)  # sidecar == ground truth
    assert len(idx) == 21  # warcinfo + 20 responses
    assert idx[0][0] == 0
    # contiguous cover of the whole file
    assert all(idx[i][0] + idx[i][1] == idx[i + 1][0] for i in range(20))
    assert idx[-1][0] + idx[-1][1] == os.path.getsize(p)


def test_plan_ranges_member_aligned(tmp_path):
    from scrapy_crawler_german_real_estate_sites_spark.sources.warc import (
        _load_index,
        plan_ranges,
    )

    p = str(tmp_path / "seg.warc.gz")
    write_warc(p, _many_recs(30))
    idx = _load_index(p)
    starts = {o for o, _ in idx}
    total = idx[-1][0] + idx[-1][1]
    tiny = max(ln for _, ln in idx) * 3
    ranges = plan_ranges([p], target_bytes=tiny)
    assert len(ranges) >= 2  # actually split
    # every split starts on a member boundary and they tile the file
    pos = 0
    for path, start, length in ranges:
        assert path == p and start == pos and start in starts
        pos = start + length
    assert pos == total


def test_one_segment_two_tasks_identical_output(spark, tmp_path):
    """VERDICT r3 item 7: ONE oversized segment read with >=2 tasks via
    member-boundary splits produces output identical to the per-file
    reader."""
    from scrapy_crawler_german_real_estate_sites_spark.sources.warc import (
        plan_ranges,
        warc_scan_ranges,
    )

    p = str(tmp_path / "big.warc.gz")
    write_warc(p, _many_recs(120))
    whole = sorted(
        (r.url, r.warc_date, r.http_status, bytes(r.html))
        for r in warc_scan(spark, p).collect()
    )
    # target chosen so the segment splits into >=2 ranges
    target = os.path.getsize(p) // 3
    assert len(plan_ranges([p], target)) >= 2
    split_df = warc_scan_ranges(spark, p, target_bytes=target)
    assert split_df.rdd.getNumPartitions() >= 2  # really >=2 tasks
    split = sorted(
        (r.url, r.warc_date, r.http_status, bytes(r.html))
        for r in split_df.collect()
    )
    assert split == whole
    assert len(split) == 120


def test_scan_ranges_without_idx_uses_built_index(spark, tmp_path):
    """Index-less segments (no .idx sidecar) still split correctly via
    the one-time sequential member indexing."""
    from scrapy_crawler_german_real_estate_sites_spark.sources.warc import (
        warc_scan_ranges,
    )

    p = str(tmp_path / "noidx.warc.gz")
    write_warc(p, _many_recs(40), index=False)
    assert not os.path.exists(p + ".idx")
    got = sorted(
        r.url for r in
        warc_scan_ranges(spark, p, target_bytes=4096).collect()
    )
    assert got == sorted(f"http://seg.example/{i:04d}" for i in range(40))


def test_scan_ranges_dir_matches_scan(spark, fix_tiny):
    """Directory mode: the range reader over the fixture's segment dir
    equals the per-file reader row-for-row."""
    from scrapy_crawler_german_real_estate_sites_spark.sources.warc import (
        warc_scan_ranges,
    )

    wdir = warc_fixture(fix_tiny, records_per_file=200)
    a = sorted(
        (r.url, bytes(r.html)) for r in warc_scan(spark, wdir).collect()
    )
    b = sorted(
        (r.url, bytes(r.html))
        for r in warc_scan_ranges(spark, wdir, target_bytes=32768).collect()
    )
    assert a == b and len(a) > 0
