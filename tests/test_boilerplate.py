"""Line-level boilerplate census: exact expected counts on a hand-built
page, plus the jusText-inspired invariants on the synthetic fixture."""

import os

from scrapy_crawler_german_real_estate_sites_spark.operators.boilerplate import (
    boilerplate_stats,
)

PAGE = "\n".join([
    "<html><head><title>T</title></head><body>",          # markup + short visible 'T'
    '<a class="x" href="/nav">Home</a>',                   # link + short -> boiler
    "<p>This paragraph carries enough visible characters to count as content.</p>",
    '<a href="/l1">Very long anchor line whose visible text exceeds the forty-character rule</a>',
    "",                                                    # empty -> boiler
    "plain text line that is certainly long enough to be kept as content",
    "<div><span></span></div>",                            # markup-only -> boiler
])


def test_exact_counts_on_handbuilt_page(spark):
    df = spark.createDataFrame([("https://h/x", PAGE)], ["url", "text"])
    r = boilerplate_stats(df).collect()[0]
    assert r["n_lines"] == 7
    # content: title-line visible 'T'? visible='T' (len 1, no anchor) -> content;
    # para, long anchor, plain text -> content => 4
    assert r["content_lines"] == 4
    assert r["boiler_lines"] == 3
    assert r["link_lines"] == 2
    assert r["content_chars"] > 100


def test_line_classification_edges(spark):
    rows = [
        ("u1", '<a href="/n">Nav</a>'),                # short link -> boiler
        ("u2", "Short."),                               # short but no link -> content
        ("u3", "<b></b>"),                              # markup only -> boiler
        ("u4", '<a href="/n">' + "y" * 60 + "</a>"),   # long link -> content
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    got = {r["url"]: r for r in boilerplate_stats(df).collect()}
    assert got["u1"]["content_lines"] == 0 and got["u1"]["boiler_lines"] == 1
    assert got["u2"]["content_lines"] == 1
    assert got["u3"]["content_lines"] == 0
    assert got["u4"]["content_lines"] == 1 and got["u4"]["link_lines"] == 1


def test_fixture_invariants(spark, fix_small):
    pages = spark.read.parquet(os.path.join(fix_small, "pages.parquet"))
    df = boilerplate_stats(pages)
    bad = df.where(
        "content_lines + boiler_lines <> n_lines OR content_chars < 0"
    ).count()
    assert bad == 0
    agg = df.selectExpr(
        "sum(content_lines) c", "sum(boiler_lines) b", "sum(link_lines) l"
    ).collect()[0]
    # the synthetic portals are listing-heavy: links exist, and both
    # classes are populated
    assert agg["c"] > 0 and agg["b"] > 0 and agg["l"] > 0


def test_no_shuffle_in_plan(spark, fix_small):
    """The census is a projection of the scan: no Exchange anywhere."""
    pages = spark.read.parquet(os.path.join(fix_small, "pages.parquet"))
    plan = boilerplate_stats(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_health_job_end_to_end(spark, fix_small, tmp_path):
    """The composed crawl-health report job over the small fixture."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "health")
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    r = subprocess.run(
        [sys.executable, os.path.join(env["PYTHONPATH"], "jobs", "health_job.py"),
         "--pages", os.path.join(fix_small, "pages.parquet"), "--out", out],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["hosts"] > 0 and summary["pages"] > 0
    rep = spark.read.parquet(out)
    cols = set(rep.columns)
    assert {"host", "n_pages", "est_distinct", "suspect_share",
            "content_chars", "boiler_line_share", "in_links",
            "out_links"} <= cols
    # every host in the report exactly once
    assert rep.count() == rep.select("host").distinct().count()
