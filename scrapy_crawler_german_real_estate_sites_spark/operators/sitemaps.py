"""Sitemap ingest — sitemap.xml / sitemap-index bodies → frontier URL rows.

Completes the discovery loop started by :mod:`.robotstxt` (whose
``Sitemap:`` lines point here): a crawler that honors robots.txt also
bootstraps its frontier from the advertised sitemaps — the highest-yield
seed source a 10^10-URL frontier has (sitemaps.org protocol, referenced
normatively by RFC 9309 §2.3).

Supported per the sitemaps.org 0.9 schema:

* ``<urlset>`` documents: one row per ``<url>`` with ``loc`` (required),
  ``lastmod``, ``changefreq``, ``priority`` when present;
* ``<sitemapindex>`` documents: one row per nested ``<sitemap>``
  flagged ``is_index=true`` — the caller enqueues those for another
  fetch round (the standard two-level expansion);
* XML entity unescaping in ``loc`` (ampersands are rife in real
  sitemap URLs), whitespace/CDATA tolerance;
* gzip payloads (``sitemap.xml.gz``) via :func:`maybe_gunzip`.

Parsing is regex-block extraction, not a DOM build — sitemaps are
machine-generated flat lists, the per-element grammar is regular, and
this keeps the hot loop allocation-light (the same reasoning as the
WARC reader's framing pass).  Row-local Arrow batches: no shuffle; one
input body explodes to its URL rows inside the pass, and output feeds
``frontier_init``/seed tables directly.
"""

from __future__ import annotations

import gzip
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_SCHEMA = (
    "src string, url string, lastmod string, changefreq string, "
    "priority double, is_index boolean"
)

_BLOCK = re.compile(r"(?s)<(url|sitemap)\b[^>]*>(.*?)</\1>")
_FIELD = re.compile(
    r"(?s)<(loc|lastmod|changefreq|priority)\b[^>]*>\s*"
    r"(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</\1>"
)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")]  # amp last


def _unescape(s: str) -> str:
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    return s


def maybe_gunzip(raw: bytes) -> str:
    """Bytes → text, transparently inflating ``*.xml.gz`` payloads."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return raw.decode("utf-8", "replace")


def parse_sitemap_text(body: str) -> list[dict]:
    """One sitemap/sitemap-index body → entry dicts (loc required; blocks
    without one are dropped, per the schema's required-field rule)."""
    out = []
    for kind, inner in _BLOCK.findall(body or ""):
        fields = {k: _unescape(v.strip()) for k, v in _FIELD.findall(inner)}
        loc = fields.get("loc")
        if not loc:
            continue
        prio = None
        if "priority" in fields:
            try:
                prio = float(fields["priority"])
            except ValueError:
                pass
        out.append({
            "url": loc,
            "lastmod": fields.get("lastmod"),
            "changefreq": fields.get("changefreq"),
            "priority": prio,
            "is_index": kind == "sitemap",
        })
    return out


def sitemap_urls(df: DataFrame, src_col: str = "url",
                 xml_col: str = "xml") -> DataFrame:
    """(src url, xml body) rows → exploded sitemap entries.

    ``xml_col`` may be string XML or binary (gz-transparent).  Rows with
    ``is_index=true`` are nested sitemap references — feed them back
    through a fetch + this operator for the two-level expansion."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"src": [], "url": [], "lastmod": [], "changefreq": [],
                   "priority": [], "is_index": []}
            for src, body in zip(pdf[src_col], pdf[xml_col]):
                if isinstance(body, (bytes, bytearray)):
                    body = maybe_gunzip(bytes(body))
                for e in parse_sitemap_text(body):
                    out["src"].append(src)
                    out["url"].append(e["url"])
                    out["lastmod"].append(e["lastmod"])
                    out["changefreq"].append(e["changefreq"])
                    out["priority"].append(e["priority"])
                    out["is_index"].append(e["is_index"])
            yield pd.DataFrame(out)

    return df.select(src_col, xml_col).mapInPandas(run, SITEMAP_SCHEMA)
