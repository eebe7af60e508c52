"""Item-output parity across the engine's memory-pressure modes.

The data-sized decisions in plans/crawl.py (`_should_cache_pages`,
`_should_spill_items`) pick between a pinned-lazy item path and a
per-wave parquet item sink, and between a cached pages projection and a
per-wave parquet re-scan.  Small fixtures + a large heap always take the
legacy path, so these tests FORCE each alternate branch via the
documented env switches and assert the item output is identical —
closing the round-3 ADVICE gap ("the new spill branch is untested in
the suite").
"""

import os

from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import (
    CrawlEngine,
    _heap_bytes,
)


def _items_sorted(eng):
    return sorted(
        tuple(r) for r in eng.items_df().select(
            "seed_id", "fifo_seq", "item_idx", "url", "item_json",
            "item_kind", "doc_json", "seen_url", "alert", "failure"
        ).collect()
    )


def _run(spark, fix_dir, tmp_path, env, monkeypatch, tag):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    eng = CrawlEngine(spark, fix_dir, hour=7,
                      workdir=str(tmp_path / tag))
    eng.run(max_waves=60)
    rows = _items_sorted(eng)
    flags = (eng.spill_items, eng.pages_cached)
    eng.close()
    for k in env:
        monkeypatch.delenv(k, raising=False)
    return rows, flags


def test_spill_items_parity(spark, fix_tiny, tmp_path, monkeypatch):
    base, (spill0, _) = _run(spark, fix_tiny, tmp_path, {}, monkeypatch, "base")
    assert not spill0  # tiny fixture + test heap takes the legacy path
    spilled, (spill1, _) = _run(
        spark, fix_tiny, tmp_path,
        {"SPARK_GRAFT_SPILL_ITEMS": "1"}, monkeypatch, "spill")
    assert spill1  # the forced branch actually ran
    assert spilled == base
    assert len(base) > 0


def test_uncached_pages_parity(spark, fix_tiny, tmp_path, monkeypatch):
    base, _ = _run(spark, fix_tiny, tmp_path, {}, monkeypatch, "base2")
    uncached, (_, cached) = _run(
        spark, fix_tiny, tmp_path,
        {"SPARK_GRAFT_PAGES_CACHE": "0"}, monkeypatch, "nocache")
    assert not cached
    assert uncached == base


def test_both_pressure_modes_parity(spark, fix_tiny, tmp_path, monkeypatch):
    base, _ = _run(spark, fix_tiny, tmp_path, {}, monkeypatch, "base3")
    both, (spill, cached) = _run(
        spark, fix_tiny, tmp_path,
        {"SPARK_GRAFT_SPILL_ITEMS": "1", "SPARK_GRAFT_PAGES_CACHE": "0"},
        monkeypatch, "both")
    assert spill and not cached
    assert both == base


def test_heap_bytes_two_letter_suffixes():
    # Spark's byteStringAsBytes accepts '4gb'/'512mb'; so must we
    # (round-3 ADVICE: ValueError on SPARK_GRAFT_DRIVER_MEM='4gb').
    assert _heap_bytes("4g") == 4 * 2**30
    assert _heap_bytes("4gb") == 4 * 2**30
    assert _heap_bytes("512mb") == 512 * 2**20
    assert _heap_bytes("512m") == 512 * 2**20
    assert _heap_bytes("128K") == 128 * 2**10
    assert _heap_bytes("2tb") == 2 * 2**40
    assert _heap_bytes("1048576") == 2**20
    assert _heap_bytes(" 1.5g ") == int(1.5) * 2**30  # int() floor, as before
