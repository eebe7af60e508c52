"""Sitemap ingest (operators/sitemaps.py): urlset + sitemapindex parsing,
entity/CDATA/gzip handling, and the exploding Spark path."""

import gzip

from scrapy_crawler_german_real_estate_sites_spark.operators.sitemaps import (
    maybe_gunzip,
    parse_sitemap_text,
    sitemap_urls,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://www.example.de/wohnung?a=1&amp;b=2</loc>
    <lastmod>2021-05-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://www.example.de/haus]]></loc></url>
  <url><lastmod>2021-01-01</lastmod></url><!-- no loc: dropped -->
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://www.example.de/sitemap-1.xml.gz</loc>
    <lastmod>2021-04-30</lastmod>
  </sitemap>
  <sitemap><loc>https://www.example.de/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def test_urlset_known_answer():
    es = parse_sitemap_text(URLSET)
    assert len(es) == 2  # loc-less block dropped
    assert es[0] == {
        "url": "https://www.example.de/wohnung?a=1&b=2",  # entity unescaped
        "lastmod": "2021-05-01",
        "changefreq": "daily",
        "priority": 0.8,
        "is_index": False,
    }
    assert es[1]["url"] == "https://www.example.de/haus"  # CDATA unwrapped
    assert es[1]["lastmod"] is None and es[1]["priority"] is None


def test_sitemapindex_flags_nested():
    es = parse_sitemap_text(INDEX)
    assert [e["is_index"] for e in es] == [True, True]
    assert es[0]["url"] == "https://www.example.de/sitemap-1.xml.gz"
    assert es[0]["lastmod"] == "2021-04-30"


def test_garbage_and_empty():
    assert parse_sitemap_text("") == []
    assert parse_sitemap_text(None) == []
    assert parse_sitemap_text("<html><body>404</body></html>") == []
    # bad priority tolerated
    es = parse_sitemap_text(
        "<urlset><url><loc>http://x/</loc>"
        "<priority>high</priority></url></urlset>")
    assert es[0]["priority"] is None


def test_maybe_gunzip():
    xml = URLSET.encode()
    assert maybe_gunzip(xml) == URLSET
    assert maybe_gunzip(gzip.compress(xml)) == URLSET


def test_sitemap_urls_spark_path(spark):
    rows = [
        ("https://www.example.de/sitemap.xml", URLSET.encode()),
        ("https://www.example.de/sitemap-index.xml",
         gzip.compress(INDEX.encode())),  # binary gz transparently inflated
    ]
    df = spark.createDataFrame(rows, "url string, xml binary")
    got = sitemap_urls(df).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, []).append(r)
    assert len(by_src["https://www.example.de/sitemap.xml"]) == 2
    idx = by_src["https://www.example.de/sitemap-index.xml"]
    assert all(r.is_index for r in idx) and len(idx) == 2
    # schema contract for frontier feeding
    assert set(sitemap_urls(df).columns) == {
        "src", "url", "lastmod", "changefreq", "priority", "is_index"}
