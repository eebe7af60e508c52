"""D7 stale-request epoch drop (reference immowelt.py:200-204).

The reference deployment re-instantiates spiders with a bumped
``progressCounter``; Splash responses still in flight from the previous
instance carry the OLD counter in request meta and their items are dropped
(``DropItem``) before extraction.  The engine's analogue: frontier rows
checkpointed by an epoch-N run carry ``progressCounter: N`` in meta; a
resume under ``epoch=N+1`` fetches them (late responses) but extracts no
items.  A same-epoch resume is the control: it completes the run exactly
(test_resume.py proves byte-exactness of that path)."""

import json

import pytest

from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import CrawlEngine


@pytest.fixture(scope="module")
def immowelt_fix(tmp_path_factory):
    from scrapy_crawler_german_real_estate_sites_spark.sources.synth import generate

    d = tmp_path_factory.mktemp("fixw") / "tiny_immowelt"
    return generate("tiny", str(d), portals=["immowelt"])


def _immowelt_item_page(fix_dir):
    """(url, body, ctx) of a fixture immowelt detail page that yields an
    item under the current epoch — found via the golden simulator."""
    import os

    import pyarrow.parquet as pq

    from scrapy_crawler_german_real_estate_sites_spark.plans.simulator import (
        simulate,
    )

    pages = pq.read_table(os.path.join(fix_dir, "pages.parquet"))
    pages_map = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    seeds = pq.read_table(os.path.join(fix_dir, "seeds.parquet")).to_pylist()
    stadte = pq.read_table(os.path.join(fix_dir, "stadte.parquet")).to_pylist()
    sim = simulate(pages_map, seeds, stadte, hour=7)
    assert sim.items, "immowelt fixture must produce items"
    seed_id, url, _item, _kind = sim.items[0]
    seed = next(s for s in seeds if s["seed_id"] == seed_id)
    from scrapy_crawler_german_real_estate_sites_spark.operators.portals.base import (
        SeedCtx,
    )

    stadt = next(s for s in stadte if int(s["id"]) == int(seed["stadtid"]))
    ctx = SeedCtx(
        seed_id=seed_id, portal="immowelt", stadtid=int(seed["stadtid"]),
        stadtname=seed["stadtname"], haus=int(seed["haus"]),
        kaufen=int(seed["kaufen"]), url=seed["url"], hour=7,
        stadtviertel=tuple(stadt["stadtviertel"]),
    )
    return url, pages_map[url], ctx


def test_parse_drops_stale_epoch_item(immowelt_fix):
    """Unit-level D7: the same detail page yields an item under the current
    counter and NOTHING under a stale one (page fetched, DropItem fires)."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.portals import (
        get_portal,
    )

    url, body, ctx = _immowelt_item_page(immowelt_fix)
    portal = get_portal("immowelt")
    fresh = portal.parse(
        "detail", body, url, {"stadtid": ctx.stadtid, "progressCounter": 0}, ctx
    )
    assert fresh.items, "control: current-epoch response must yield the item"
    stale = portal.parse(
        "detail", body, url, {"stadtid": ctx.stadtid, "progressCounter": -1}, ctx
    )
    assert stale.items == [] and stale.links == []


def test_resume_under_bumped_epoch_drops_inflight_items(
    spark, immowelt_fix, tmp_path
):
    """Engine-level D7 (two-epoch scenario): checkpoint an epoch-0 run
    mid-crawl, resume under epoch=1 — the resumed frontier's detail rows
    are late responses from the old instance: all fetched, zero items.  A
    same-epoch resume of the identical checkpoint extracts >0 items."""
    # bounded politeness (10 tokens/wave on the one immowelt netloc) so the
    # detail fan-out spans waves and a checkpoint can catch details
    # in flight — unbounded waves would drain every detail the wave it
    # appears, leaving nothing "late"
    part = CrawlEngine(
        spark, immowelt_fix, hour=7, workdir=str(tmp_path),
        track_order=False, iter_seconds=100.0,
    )
    for _ in range(60):
        part.run_wave()
        kinds = {r.kind for r in part.pending.select("kind").distinct().collect()}
        # checkpoint at a boundary where ONLY detail rows are in flight:
        # every pending row is then a previous-epoch late response, so the
        # bumped resume's item count has an exact expectation (zero)
        if kinds == {"detail"}:
            break
    assert {r.kind for r in part.pending.select("kind").distinct().collect()} == {
        "detail"
    }, "fixture walk never reached a detail-only frontier"
    part.checkpoint()
    ckpt = str(tmp_path / f"ckpt_{part.iteration:04d}")
    # the checkpointed pending frontier must actually hold epoch-0 detail
    # rows for the scenario to be meaningful
    pend = spark.read.parquet(f"{ckpt}/pending")
    stale_details = [
        r
        for r in pend.collect()
        if r.kind == "detail" and json.loads(r.meta or "{}").get("progressCounter") == 0
    ]
    assert stale_details, "checkpoint must carry in-flight epoch-0 detail rows"
    part.close()

    control = CrawlEngine(
        spark, immowelt_fix, hour=7, track_order=False, iter_seconds=100.0
    )
    control.resume_from(ckpt)
    c = control.run(max_waves=120)
    assert c["items"] > 0, "control: same-epoch resume extracts items"
    control.close()

    bumped = CrawlEngine(
        spark, immowelt_fix, hour=7, track_order=False, iter_seconds=100.0,
        epoch=1,
    )
    bumped.resume_from(ckpt)
    b = bumped.run(max_waves=120)
    # every resumed detail row is stale → fetched but dropped before
    # extraction (D7 drops ITEMS, not requests): zero items, and at least
    # as many fetches as the control (never fewer — a budget stop in the
    # control can only reduce its fetches, and dropped items never count
    # toward CLOSESPIDER_ITEMCOUNT)
    assert b["items"] == 0
    assert b["fetched"] >= c["fetched"] > 0
    bumped.close()
