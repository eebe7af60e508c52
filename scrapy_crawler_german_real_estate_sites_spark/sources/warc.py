"""WARC (Web ARChive, ISO 28500) source — ingest Common-Crawl-style
archives into the north-rule pages table.

The engine's input contract (BASELINE.json:input_hint) is an Iceberg/
parquet table of ``(url, warc_ts, html, text, lang)`` rows — exactly what
Common Crawl publishes, except CC publishes it as WARC files: per-record
gzip members concatenated into ~1 GB ``*.warc.gz`` segment files.  This
module closes that gap: a deterministic WARC *writer* (fixtures — no
external data enters the sandbox) and a distributed WARC *reader* that
lands raw archive bytes in the pages-table shape.

Scale design (the 100 TB question):

* **The file is the parallelism unit.**  ``spark.read.format("binaryFile")``
  plans one task per file; a Common-Crawl snapshot is ~72 000 segment
  files of ~1 GB — ample fan-out for a 1000-executor cluster with zero
  shuffle: ingest is a pure map (scan → parse → project), so the job's
  only exchange is whatever the *writer* side needs.  Per-file tasks are
  the proven CC-processing topology; for pathological oversized
  segments, :func:`warc_scan_ranges` splits ONE file across tasks at the
  per-record gzip member boundaries (the CC convention, reproduced by
  :func:`write_warc` together with a cdx-style ``.idx`` offset sidecar).
* **Bytes cross the Arrow boundary once.**  Record framing + HTTP
  de-enveloping need imperative byte handling, so they run in ONE
  Arrow-batched ``mapInPandas`` (the same budget as the parse stage);
  everything derivable by expressions (text extraction, language ID,
  hashing, sizes) stays JVM-side on the result so Catalyst can prune and
  push down when a query reads only ``(url, lang)``.
* **No driver round-trips**: the reader never collects; malformed tails
  are dropped per-file in the worker (CC reality — truncated members do
  occur) and surfaced via the ``n_bad`` counter column on request.

Reference behavior being generalized: the reference spiders fetch live
HTML over HTTP one page at a time (``/root/reference/demo_crawl/spiders/
*.py``); at web scale the equivalent input is a crawl archive.  The
record framing follows the WARC 1.0/1.1 spec (ISO 28500) and the HTTP
payload convention of RFC 2616 — public formats, implemented from the
spec text.
"""

from __future__ import annotations

import datetime
import gzip
import hashlib
import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

# --------------------------------------------------------------------------
# writer (fixture side — deterministic byte-for-byte)
# --------------------------------------------------------------------------


def _warc_date(ts: datetime.datetime) -> str:
    """ISO 8601 Zulu; fractional seconds only when present (WARC 1.1)."""
    if ts.microsecond:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _http_response(html: bytes, content_type: str) -> bytes:
    return (
        b"HTTP/1.1 200 OK" + _CRLF
        + f"Content-Type: {content_type}".encode() + _CRLF
        + f"Content-Length: {len(html)}".encode() + _CRLF
        + _CRLF
        + html
    )


def record_bytes(url: str, ts: datetime.datetime, html: bytes,
                 content_type: str = "text/html; charset=utf-8") -> bytes:
    """One WARC/1.0 response record (header block + HTTP payload + the
    two-CRLF record separator the spec mandates)."""
    payload = _http_response(html, content_type)
    rid = hashlib.md5(url.encode() + _warc_date(ts).encode()).hexdigest()
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + f"WARC-Record-ID: <urn:uuid:{rid}>".encode() + _CRLF
        + f"WARC-Date: {_warc_date(ts)}".encode() + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
    )
    return header + payload + _CRLF + _CRLF


def warcinfo_bytes(ts: datetime.datetime, info: str) -> bytes:
    """A warcinfo record (CC segments start with one; readers must skip)."""
    payload = info.encode()
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + f"WARC-Date: {_warc_date(ts)}".encode() + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
    )
    return header + payload + _CRLF + _CRLF


def write_warc(path: str, records: list[tuple], gzip_members: bool = True,
               info: str = "software: spark-crawl-engine\r\n",
               index: bool = True) -> None:
    """Write ``records = [(url, ts, html_bytes), ...]`` as one WARC file.

    ``gzip_members=True`` reproduces the Common-Crawl convention: every
    record is its own gzip member and the members are concatenated (the
    file as a whole is a valid multi-member gzip stream).  ``mtime=0`` and
    no filename header keep the bytes deterministic.

    ``index=True`` (member-gzip only) also writes ``<path>.idx`` — one
    ``offset length`` line per member, the same information Common Crawl
    publishes as its cdx index — which lets :func:`warc_scan_ranges`
    split ONE oversized segment across many tasks at member boundaries."""
    first = warcinfo_bytes(records[0][1] if records else
                           datetime.datetime(2021, 1, 1), info)
    chunks = [first] + [record_bytes(u, t, h) for (u, t, h) in records]
    with open(path, "wb") as f:
        if gzip_members:
            offsets = []
            for c in chunks:
                z = gzip.compress(c, 9, mtime=0)
                offsets.append((f.tell(), len(z)))
                f.write(z)
            if index:
                with open(path + ".idx", "w") as ix:
                    ix.writelines(f"{o} {l}\n" for o, l in offsets)
        else:
            for c in chunks:
                f.write(c)


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenated-member gzip stream (CC convention).
    Tolerates a truncated final member: everything that decompressed
    cleanly is kept."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data[pos:]))
            out.append(d.flush())
        except zlib.error:
            break  # truncated/corrupt tail — keep the clean prefix
        if not d.unused_data:
            break
        pos = n - len(d.unused_data)
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{headers: {lower_name: value}, payload: bytes}`` per record.

    Accepts plain or gzip(-member) WARC bytes.  Framing per ISO 28500:
    version line, named fields to a blank line, ``Content-Length`` octets
    of payload, two CRLFs.  Malformed tails end iteration (the clean
    prefix is kept), mirroring how CC processors treat truncated
    segments."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # lost framing — stop at the clean prefix
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].split(_CRLF)
        headers = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated record
        yield {"headers": headers, "payload": data[body_start:body_start + clen]}
        pos = body_start + clen


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """(status, lower-cased headers, body) from an HTTP response payload."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return 0, {}, payload
    head = payload[:sep].split(_CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    headers = {}
    for ln in head[1:]:
        k, s, v = ln.partition(b":")
        if s:
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("utf-8", "replace")
            )
    return status, headers, payload[sep + 4:]


_SCAN_SCHEMA = (
    "warc_file string, url string, warc_date string, http_status int, "
    "content_type string, html binary"
)


def warc_scan(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC ingest: ``binaryFile`` scan → one Arrow pass that
    unframes records and de-envelopes HTTP → one row per *response*
    record.  ``warc_date`` stays a string here; cast it JVM-side
    (:func:`pages_from_warc`) so the Arrow batch carries no timestamp
    semantics."""
    bf = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc.gz") if os.path.isdir(path) else path
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "warc_file", "url", "warc_date", "http_status",
                "content_type", "html")}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(fpath)
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    status, hh, body = parse_http_response(rec["payload"])
                    out["warc_file"].append(fname)
                    out["url"].append(h.get("warc-target-uri", ""))
                    out["warc_date"].append(h.get("warc-date", ""))
                    out["http_status"].append(status)
                    out["content_type"].append(hh.get("content-type", ""))
                    out["html"].append(body)
            yield pd.DataFrame(out)

    return bf.select("path", "content").mapInPandas(run, _SCAN_SCHEMA)


# --------------------------------------------------------------------------
# offset-split reader — fan ONE oversized segment across many tasks
# --------------------------------------------------------------------------


def build_member_index(path: str) -> list[tuple[int, int]]:
    """(offset, length) of every gzip member in a member-gzip WARC file.

    One sequential decompress pass (boundaries come from
    ``decompressobj.unused_data``, the only reliable detector — magic-byte
    scans false-positive inside compressed data).  This is the one-time
    indexing job a pipeline runs per segment when the archive ships
    without a cdx; CC itself publishes offsets, and :func:`write_warc`
    emits them as ``<path>.idx``."""
    offsets = []
    with open(path, "rb") as f:
        data = f.read()
    view = memoryview(data)  # zero-copy slicing: feeding decompress a
    pos, n = 0, len(data)    # bytes slice would memcpy the whole tail
    while pos < n and data[pos:pos + 2] == b"\x1f\x8b":  # per member
        d = zlib.decompressobj(wbits=31)
        try:
            d.decompress(view[pos:])
            d.flush()
        except zlib.error:
            break
        end = n - len(d.unused_data)
        offsets.append((pos, end - pos))
        if not d.unused_data:
            break
        pos = end
    return offsets


def _load_index(path: str) -> list[tuple[int, int]]:
    idx_path = path + ".idx"
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            return [
                (int(o), int(ln))
                for o, ln in (line.split() for line in f if line.strip())
            ]
    return build_member_index(path)


def plan_ranges(files: list[str], target_bytes: int) -> list[tuple]:
    """Pack each file's member index into ``(path, start, length)`` splits
    of ~``target_bytes`` of COMPRESSED bytes, each aligned to member
    boundaries.  Records never span members (one record = one member, the
    CC convention), so every split unframes independently."""
    ranges = []
    for path in files:
        members = _load_index(path)
        if not members:
            continue
        start, acc = members[0][0], 0
        for off, ln in members:
            if acc and acc + ln > target_bytes:
                ranges.append((path, start, off - start))
                start, acc = off, 0
            acc += ln
        end = members[-1][0] + members[-1][1]
        ranges.append((path, start, end - start))
    return ranges


def warc_scan_ranges(spark: SparkSession, path: str,
                     target_bytes: int = 64 * 2**20) -> DataFrame:
    """Offset-split WARC ingest: same output contract as :func:`warc_scan`,
    but the parallelism unit is a member-aligned BYTE RANGE instead of a
    whole file — so one pathological >1 GB segment no longer straggles as
    a single task.

    Shape: the driver reads only the tiny ``.idx`` sidecars (or indexes
    index-less files once via :func:`build_member_index`), packs members
    into ~``target_bytes`` splits, and parallelizes the split list; each
    task seeks into its file, reads exactly its compressed slice, and
    unframes it in the same Arrow pass as the per-file reader.  This is
    the binaryFile topology with the file→split substitution a real
    cluster does via FileSplit; executors read ranges through whatever
    storage client serves the path (local fs here, HDFS/S3 in
    deployment).  Zero shuffle; output partitioning = splits."""
    files = (
        sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".warc.gz")
        )
        if os.path.isdir(path) else [path]
    )
    ranges = plan_ranges(files, target_bytes)
    rdf = spark.createDataFrame(
        ranges, "path string, start long, length long"
    ).repartition(max(len(ranges), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "warc_file", "url", "warc_date", "http_status",
                "content_type", "html")}
            for fpath, start, length in zip(
                    pdf["path"], pdf["start"], pdf["length"]):
                with open(fpath, "rb") as f:
                    f.seek(int(start))
                    blob = f.read(int(length))
                fname = os.path.basename(fpath)
                for rec in iter_warc_records(blob):
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    status, hh, body = parse_http_response(rec["payload"])
                    out["warc_file"].append(fname)
                    out["url"].append(h.get("warc-target-uri", ""))
                    out["warc_date"].append(h.get("warc-date", ""))
                    out["http_status"].append(status)
                    out["content_type"].append(hh.get("content-type", ""))
                    out["html"].append(body)
            yield pd.DataFrame(out)

    return rdf.mapInPandas(run, _SCAN_SCHEMA)


# --------------------------------------------------------------------------
# html → text (expression-only, DuckDB-mirrorable)
# --------------------------------------------------------------------------

# Ordered spec shared with the SQL oracle: patterns restricted to the
# Java ∩ RE2 syntax ((?s) dotall + lazy quantifiers, no backreferences)
# so both engines transform byte-for-byte identically.
HTML_TEXT_PATTERNS = [
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]
HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&amp;", "&"),  # &amp; last: it unescapes escapes
]


def html_to_text(col: Column) -> Column:
    """Boilerplate-stripped visible text from an HTML string column —
    whole-stage-codegen expressions only (the WET-extraction step of a CC
    pipeline, minus readability heuristics)."""
    x = col
    for pat, rep in HTML_TEXT_PATTERNS:
        x = F.regexp_replace(x, pat, rep)
    for ent, rep in HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def sql_html_to_text(expr: str) -> str:
    """The identical chain as a DuckDB expression (oracle mirror)."""
    x = expr
    for pat, rep in HTML_TEXT_PATTERNS:
        x = f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    for ent, rep in HTML_ENTITIES:
        r = rep.replace("'", "''")
        x = f"replace({x}, '{ent}', '{r}')"
    return f"trim(regexp_replace({x}, '\\s+', ' ', 'g'))"


def pages_from_warc(scanned: DataFrame) -> DataFrame:
    """North-rule pages projection ``(url, warc_ts, html, text, lang)``
    from :func:`warc_scan` output — all JVM-side expressions."""
    from ..functions.textops import lang_id

    html_str = F.decode(F.col("html"), "UTF-8")
    text = html_to_text(html_str)
    return scanned.select(
        "url",
        F.to_timestamp(
            F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'"
        ).alias("warc_ts"),
        "html",
        text.alias("text"),
        lang_id(text).alias("lang"),
        "warc_file",
        "http_status",
    )


# --------------------------------------------------------------------------
# fixture (deterministic, derived from the tier's synthetic web)
# --------------------------------------------------------------------------


def warc_fixture(fix_dir: str, records_per_file: int = 500,
                 max_records: int = 20_000) -> str:
    """Materialize the tier's pages as Common-Crawl-style segment files.

    Reads ``fix_dir/pages.parquet`` (the deterministic synthetic web),
    frames the first ``max_records`` pages (url order) into ``*.warc.gz``
    segments of ``records_per_file`` records each, and writes
    ``expected_warc.parquet`` — the ground truth the ingest oracle reads.
    Idempotent via a done-marker."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(fix_dir, "warc")
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(
        os.path.join(fix_dir, "pages.parquet"), columns=["url", "warc_ts", "html"]
    )
    rows = sorted(
        zip(tbl.column("url").to_pylist(), tbl.column("warc_ts").to_pylist(),
            tbl.column("html").to_pylist()),
        key=lambda r: r[0],
    )[:max_records]
    exp = {"url": [], "warc_ts": [], "html_str": [], "warc_file": []}
    for i in range(0, len(rows), records_per_file):
        chunk = rows[i:i + records_per_file]
        fname = f"crawl-{i // records_per_file:05d}.warc.gz"
        write_warc(os.path.join(out_dir, fname), chunk)
        for u, t, h in chunk:
            exp["url"].append(u)
            exp["warc_ts"].append(t)
            exp["html_str"].append(h.decode("utf-8"))
            exp["warc_file"].append(fname)
    pq.write_table(
        pa.table(exp), os.path.join(fix_dir, "expected_warc.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
