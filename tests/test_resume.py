"""Resume-from-checkpoint exactness (north_rule: "runs resume exactly")."""

from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import CrawlEngine


def test_resume_exact(spark, fix_tiny, tmp_path):
    # uninterrupted reference run
    full = CrawlEngine(spark, fix_tiny, hour=7, track_order=True)
    full.run(max_waves=60)
    full_seen = {r.url for r in full.seen.select("url").collect()}
    full_fetch = full.fetch_order()

    # interrupted run: 3 waves, checkpoint, then a FRESH engine resumes
    part = CrawlEngine(spark, fix_tiny, hour=7, workdir=str(tmp_path), track_order=True)
    for _ in range(3):
        part.run_wave()
    part.checkpoint()
    ckpt = str(tmp_path / "ckpt_0003")

    resumed = CrawlEngine(spark, fix_tiny, hour=7, track_order=True)
    resumed.resume_from(ckpt)
    resumed.run(max_waves=60)

    res_seen = {r.url for r in resumed.seen.select("url").collect()}
    assert res_seen == full_seen

    # fetches after the checkpoint equal the tail of the full run
    pre = {(s, f) for s, f, _, _ in part.fetch_order()}
    tail_full = [r for r in full_fetch if (r[0], r[1]) not in pre]
    assert resumed.fetch_order() == tail_full

    # per-seed state converges to the same totals
    for sid, st in full.state.items():
        r = resumed.state[sid]
        assert r["scraped"] == st["scraped"]
        assert r["stopped"] == st["stopped"]
