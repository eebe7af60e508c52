"""Link-graph analytics: edge extraction, PageRank, anchor-text rollup."""

import numpy as np
import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.graph import (
    anchor_text, extract_edges, pagerank,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_extract_edges_resolution_rules(spark):
    pages = _pages(spark, [
        (
            "https://a.example/page1",
            '<a href="/rel">r</a> <a href="https://b.example/x">b</a> '
            '<a href="javascript:void(0)">j</a> <a href="mailto:x@y.z">m</a> '
            '<a href="/frag#sec">f</a> <a href="https://a.example/page1">self</a> '
            '<a href="/rel">dup</a>',
        ),
    ])
    got = {(r.src, r.dst) for r in extract_edges(pages).collect()}
    assert got == {
        ("https://a.example/page1", "https://a.example/rel"),       # relative
        ("https://a.example/page1", "https://b.example/x"),         # absolute
        ("https://a.example/page1", "https://a.example/frag"),      # fragment cut
    }  # javascript/mailto dropped, self-loop dropped, duplicate collapsed


def _numpy_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        for s, t in edges:
            nxt[idx[t]] += r[idx[s]] / out[s]
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {u: r[idx[u]] * n for u in nodes}


def test_pagerank_matches_reference_impl(spark):
    # hub-and-spoke plus a dangling sink and a cycle
    edges = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"),
        ("hub", "a"), ("hub", "sink"),
        ("a", "b"), ("b", "c"), ("c", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.url: r.rank_mass for r in pagerank(df, iters=12).collect()}
    want = _numpy_pagerank(edges, iters=12)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9)
    # the hub must out-rank every spoke
    assert got["hub"] == max(got.values())


def test_pagerank_mass_conserved(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]  # d dangles
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iters=6).collect()
    # total mass stays n * (1/n) = n in rank_mass units / n = 1 per node avg
    assert sum(r.rank_mass for r in out) == pytest.approx(len(out), abs=1e-9)


def test_anchor_text_rollup_and_plan(spark):
    pages = _pages(spark, [
        ("https://a.example/p1",
         '<a id="1" href="/t">Details</a> <a id="2" href="/t">Details</a> '
         '<a id="3" href="/t">Angebot</a>'),
        ("https://a.example/p2",
         '<a id="4" href="/t">Angebot</a> <a id="5" href="/u"></a> '
         '<a id="6" href="/u">Zur Karte</a>'),
    ])
    out = {r.dst: r for r in anchor_text(pages).collect()}
    t = out["https://a.example/t"]
    # 2x Details vs 2x Angebot -> lexicographic tie-break picks Angebot
    assert (t.n_anchors, t.n_unique_anchors, t.top_anchor) == (4, 2, "Angebot")
    u = out["https://a.example/u"]
    assert (u.n_anchors, u.n_unique_anchors, u.top_anchor) == (1, 1, "Zur Karte")
    # top-1 rank filter must run as the pre-shuffle group limit
    plan = anchor_text(pages)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_host_graph_rollup(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.graph import (
        host_graph,
    )

    edges = spark.createDataFrame(
        [
            ("https://a.x/1", "https://a.x/2"),
            ("https://a.x/1", "https://b.x/1"),
            ("https://a.x/2", "https://b.x/1"),
            ("https://b.x/1", "https://a.x/1"),
        ],
        ["src", "dst"],
    )
    got = {
        (r["src_host"], r["dst_host"]): r for r in host_graph(edges).collect()
    }
    assert got[("a.x", "a.x")]["n_links"] == 1 and got[("a.x", "a.x")]["intra"]
    assert got[("a.x", "b.x")]["n_links"] == 2 and not got[("a.x", "b.x")]["intra"]
    assert got[("b.x", "a.x")]["n_links"] == 1
