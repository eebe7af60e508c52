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
