"""PageRank-fed frontier priority (opt-in; VERDICT r3 item 8).

With a (url, rank_mass) table supplied, the engine's drain discipline
becomes priority order (depth + kind weight − normalized rank boost,
fifo tie-break) instead of pure FIFO — token-bucketed waves then fetch
high-rank URLs in EARLIER waves.  Off by default: the parity suites'
FIFO ordering contract (A6) is untouched unless a rank table is passed
(`tests/test_crawl_parity.py` keeps pinning that).
"""

from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import CrawlEngine


def _wave_of(spark, fix, ranks=None, max_waves=12):
    """Run token-bucketed waves; return ({url: wave_idx}, seen_set)."""
    eng = CrawlEngine(
        spark, fix, hour=7, iter_seconds=400.0, track_order=True,
        priority_ranks=ranks,
    )
    wave_of = {}
    for w in range(max_waves):
        before = len(eng.logs["fetch"])
        m = eng.run_wave()
        for (_, _, url, _) in eng.logs["fetch"][before:]:
            wave_of.setdefault(url, w)
        if m.get("selected", 0) == 0:
            break
    seen = {r.url for r in eng.seen.select("url").collect()}
    eng.close()
    return wave_of, seen


def test_rank_boost_reorders_drain(spark, fix_tiny):
    base_wave, base_seen = _wave_of(spark, fix_tiny)
    last = max(base_wave.values())
    assert last >= 2, "expected a multi-wave drain under iter_seconds=400"
    # boost the LAST-drained pages: with FIFO they fetch late, with a
    # dominant rank boost they must jump to earlier waves
    boosted = sorted(u for u, w in base_wave.items() if w == last)[:3]
    assert boosted
    ranks = spark.createDataFrame(
        [(u, 1000.0) for u in boosted], "url string, rank_mass double"
    )
    prio_wave, prio_seen = _wave_of(spark, fix_tiny, ranks=ranks)

    # the crawl's coverage is unchanged — only the ORDER moved
    assert prio_seen == base_seen
    assert set(prio_wave) == set(base_wave)
    for u in boosted:
        assert prio_wave[u] < base_wave[u], (
            f"{u}: wave {prio_wave[u]} !< {base_wave[u]}"
        )


def test_zero_mass_ranks_fall_back_to_fifo(spark, fix_tiny):
    """Degenerate rank tables (all-zero mass / empty) normalize to no
    boost — the engine detects that at construction and keeps the pure
    FIFO path (no per-wave join, byte-identical drain)."""
    zero = spark.createDataFrame(
        [("http://nowhere.example/x", 0.0)], "url string, rank_mass double"
    )
    eng = CrawlEngine(spark, fix_tiny, hour=7, priority_ranks=zero)
    assert eng._rank_df is None
    eng.close()
    empty = spark.createDataFrame([], "url string, rank_mass double")
    eng2 = CrawlEngine(spark, fix_tiny, hour=7, priority_ranks=empty)
    assert eng2._rank_df is None
    eng2.close()
    eng3 = CrawlEngine(spark, fix_tiny, hour=7)  # default: no ranks
    assert eng3._rank_df is None
    eng3.close()


def test_pagerank_output_plugs_in(spark, fix_tiny):
    """The documented wiring: operators/graph.py:pagerank output feeds
    priority_ranks directly (schema contract), and the joined-priority
    tag path executes."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [("http://a.example/", "http://b.example/"),
         ("http://c.example/", "http://b.example/"),
         ("http://b.example/", "http://a.example/")],
        "src string, dst string",
    )
    ranks = pagerank(edges, iters=3)  # (url, rank_mass) — direct plug-in
    eng = CrawlEngine(spark, fix_tiny, hour=7, priority_ranks=ranks)
    assert eng._rank_df is not None
    m = eng.run_wave()  # drives the joined-priority tag path
    assert m["fetched"] > 0
    eng.close()
