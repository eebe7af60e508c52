"""Unit tests for the politeness selection operators (SURVEY.md P1-P8).

tag_batch is the engine's fused form (boolean ``sel`` over the pending
set); select_batch is the thin public filter over it.  These tests pin
the bounded-mode semantics that the crawl parity suite only exercises
indirectly: token buckets rank by (fifo_seq, seed_id) within a netloc,
budget prefixes count eligible detail rows only, and ``not_before``
gating excludes deferred rows from the cumulative windows.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapy_crawler_german_real_estate_sites_spark.operators import politeness

PENDING_COLS = (
    "seed_id string, fifo_seq long, url string, kind string, netloc string, "
    "meta string, not_before int, depth int"
)
STATE_COLS = (
    "seed_id string, scraped int, stop_condition int, spider_stop boolean, "
    "stopped boolean, budget int"
)
ROBOTS_COLS = (
    "netloc string, crawl_delay_s double, max_concurrent int, "
    "disallow_prefixes array<string>"
)


def _pending(spark, rows):
    return spark.createDataFrame(rows, PENDING_COLS)


def _state(spark, rows):
    return spark.createDataFrame(rows, STATE_COLS)


def _robots(spark, rows=()):
    return spark.createDataFrame(list(rows), ROBOTS_COLS)


def _sel_urls(df):
    return [r.url for r in df.orderBy("seed_id", "fifo_seq").collect()]


def test_token_bucket_prefix_per_netloc(spark):
    """P1: at most ceil(iter_seconds/delay) * max_concurrent rows per
    netloc per wave, taken in (fifo_seq, seed_id) order."""
    rows = [
        ("s1", i, f"http://a.de/{i}", "detail", "a.de", "{}", 0, 1)
        for i in range(1, 6)
    ] + [("s2", 1, "http://b.de/1", "detail", "b.de", "{}", 0, 1)]
    st = [("s1", 0, 0, False, False, 100), ("s2", 0, 0, False, False, 100)]
    rb = [("a.de", 10.0, 1, []), ("b.de", 10.0, 1, [])]
    out = politeness.select_batch(
        _pending(spark, rows), _state(spark, st), _robots(spark, rb),
        iter_no=0, iter_seconds=20.0,
    )
    # 20s / 10s delay * 1 concurrent = 2 tokens for a.de
    assert _sel_urls(out) == [
        "http://a.de/1", "http://a.de/2", "http://b.de/1"
    ]


def test_budget_prefix_counts_details_only(spark):
    """P7: a seed with (budget - scraped) = 2 selects 2 details; listing
    rows don't consume budget and rows after the cut-off defer."""
    rows = [
        ("s1", 1, "http://a.de/l1", "listing", "a.de", "{}", 0, 1),
        ("s1", 2, "http://a.de/d1", "detail", "a.de", "{}", 0, 1),
        ("s1", 3, "http://a.de/d2", "detail", "a.de", "{}", 0, 1),
        ("s1", 4, "http://a.de/d3", "detail", "a.de", "{}", 0, 1),
    ]
    st = [("s1", 123, 0, False, False, 125)]
    out = politeness.select_batch(
        _pending(spark, rows), _state(spark, st), _robots(spark),
        iter_no=0, iter_seconds=1e6,
    )
    assert _sel_urls(out) == [
        "http://a.de/l1", "http://a.de/d1", "http://a.de/d2"
    ]


def test_not_before_defers_and_excludes_from_windows(spark):
    """P4: a backoff row neither selects nor counts toward the budget
    prefix of later rows this wave; it becomes eligible when its
    not_before passes."""
    rows = [
        ("s1", 1, "http://a.de/d1", "detail", "a.de", "{}", 3, 1),
        ("s1", 2, "http://a.de/d2", "detail", "a.de", "{}", 0, 1),
    ]
    st = [("s1", 124, 0, False, False, 125)]  # 1 remaining
    out0 = politeness.select_batch(
        _pending(spark, rows), _state(spark, st), _robots(spark),
        iter_no=0, iter_seconds=1e6,
    )
    # d1 deferred; d2 takes the single remaining budget slot
    assert _sel_urls(out0) == ["http://a.de/d2"]
    out3 = politeness.select_batch(
        _pending(spark, rows), _state(spark, st), _robots(spark),
        iter_no=3, iter_seconds=1e6,
    )
    # at iter 3 d1 is eligible and, being earlier in fifo order, wins
    assert _sel_urls(out3) == ["http://a.de/d1"]


def test_stopped_seed_dropped_spider_stop_drains_to_listing(spark):
    """D3/P7: stopped seeds vanish from the tagged set entirely; a
    spider_stop seed fetches only rows before (and including) its next
    listing page."""
    rows = [
        ("s1", 1, "http://a.de/d1", "detail", "a.de", "{}", 0, 1),
        ("s1", 2, "http://a.de/l1", "listing", "a.de", "{}", 0, 1),
        ("s1", 3, "http://a.de/d2", "detail", "a.de", "{}", 0, 1),
        ("s2", 1, "http://b.de/d1", "detail", "b.de", "{}", 0, 1),
    ]
    st = [
        ("s1", 0, 0, True, False, 125),   # spider_stop
        ("s2", 0, 0, False, True, 125),   # stopped
    ]
    tagged = politeness.tag_batch(
        _pending(spark, rows), _state(spark, st), _robots(spark),
        iter_no=0, iter_seconds=1e6,
    )
    got = {(r.url, r.sel) for r in tagged.collect()}
    assert got == {
        ("http://a.de/d1", True),   # before the listing: drains
        ("http://a.de/l1", True),   # the listing itself: fetched-then-close
        ("http://a.de/d2", False),  # after the listing: held
    }


def test_tag_batch_partitions_pending_exactly(spark):
    """The engine contract: sel=true rows == select_batch output, and
    sel partitions the non-stopped pending set (no row lost or duped)."""
    rows = [
        ("s%d" % (i % 3), i, "http://h%d.de/%d" % (i % 4, i),
         "detail" if i % 5 else "listing", "h%d.de" % (i % 4), "{}",
         0 if i % 7 else 1, 1)
        for i in range(1, 40)
    ]
    st = [("s0", 120, 0, False, False, 125),
          ("s1", 0, 0, False, False, 125),
          ("s2", 0, 0, True, False, 125)]
    rb = [("h1.de", 5.0, 2, [])]
    args = dict(iter_no=1, iter_seconds=30.0)
    pend, stdf, rbdf = _pending(spark, rows), _state(spark, st), _robots(spark, rb)
    tagged = politeness.tag_batch(pend, stdf, rbdf, **args)
    sel = politeness.select_batch(pend, stdf, rbdf, **args)
    tag_sel = {r.url for r in tagged.where(F.col("sel")).collect()}
    assert tag_sel == {r.url for r in sel.collect()}
    assert tagged.count() == len(rows)  # no stopped seeds in this set
    assert tagged.where(F.col("sel")).count() + \
        tagged.where(~F.col("sel")).count() == len(rows)


# ---------------------------------------------------------------------------
# P3: AutoThrottle latency feedback
# ---------------------------------------------------------------------------

def _scrapy_adjust(prev, latency, ok=True, mind=10.0, maxd=35.0, tc=1.0):
    # independent reimplementation of scrapy/extensions/throttle.py
    target = latency / tc
    new = (prev + target) / 2.0
    new = max(target, new)
    new = min(max(mind, new), maxd)
    if not ok and new <= prev:
        return prev
    return new


def test_autothrottle_update_matches_scrapy_rule():
    from scrapy_crawler_german_real_estate_sites_spark.operators.politeness import (
        AT_START_DELAY, autothrottle_update,
    )

    d = AT_START_DELAY
    want = AT_START_DELAY
    # fast, slow, very slow (clamps at 35), fast again, failed-slow,
    # failed-fast (no decrease on failure)
    seq = [(0.5, True), (22.0, True), (90.0, True), (1.0, True),
           (60.0, False), (0.1, False)]
    for lat, ok in seq:
        d = autothrottle_update(d, lat, ok)
        want = _scrapy_adjust(want, lat, ok)
        assert d == pytest.approx(want)
    # floor is DOWNLOAD_DELAY=10, ceiling 35 (reference settings.py:53,99)
    assert 10.0 <= d <= 35.0


def test_autothrottle_fold_equals_sequential(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.politeness import (
        AT_START_DELAY, autothrottle_fold,
    )

    rows = [
        ("a.example", 2, 30.0, True),
        ("a.example", 1, 2.0, True),   # out of order: fold sorts by fifo_seq
        ("b.example", 1, 90.0, True),
    ]
    resp = spark.createDataFrame(
        rows, "netloc string, fifo_seq long, latency_s double, ok boolean"
    )
    got = autothrottle_fold(resp, {"b.example": 12.0})
    want_a = _scrapy_adjust(_scrapy_adjust(AT_START_DELAY, 2.0), 30.0)
    want_b = _scrapy_adjust(12.0, 90.0)
    assert got["a.example"] == pytest.approx(want_a)
    assert got["b.example"] == pytest.approx(want_b)


def test_tag_batch_autothrottle_delays_shrink_tokens(spark):
    # 12 pending rows on one netloc, iter_seconds=100: static delay 10
    # gives 10 tokens; a folded AutoThrottle delay of 35 gives ceil(100/35)
    # = 3. The delay can only slow a host (greatest with the static rate).
    rows = [("s", i, f"u{i}", "detail", "big.example", "", 0, 1)
            for i in range(12)]
    pend = _pending(spark, rows)
    state = _state(spark, [("s", 0, 0, False, False, 10_000)])
    robots = _robots(spark, [("big.example", 10.0, 1, [])])

    base = politeness.select_batch(pend, state, robots, 0, iter_seconds=100.0)
    assert base.count() == 10

    delays = spark.createDataFrame(
        [("big.example", 35.0)], "netloc string, delay_s double"
    )
    slowed = politeness.select_batch(
        pend, state, robots, 0, iter_seconds=100.0, delays=delays
    )
    assert slowed.count() == 3
    # a folded delay FASTER than the static rate must not speed it up
    fast = spark.createDataFrame(
        [("big.example", 1.0)], "netloc string, delay_s double"
    )
    unchanged = politeness.select_batch(
        pend, state, robots, 0, iter_seconds=100.0, delays=fast
    )
    assert unchanged.count() == 10


def test_engine_autothrottle_smoke(spark, fix_tiny):
    # opt-in end-to-end: the engine completes with feedback on, populates
    # per-netloc delays in [10, 35], and the default-off path is what the
    # parity suites pin elsewhere.
    from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(spark, fix_tiny, hour=7, autothrottle=True,
                      iter_seconds=100.0)
    try:
        eng.run_wave()
        eng.run_wave()
        assert eng.at_delays, "no folded delays after a fetching wave"
        assert all(10.0 <= d <= 35.0 for d in eng.at_delays.values())
    finally:
        eng.close()
