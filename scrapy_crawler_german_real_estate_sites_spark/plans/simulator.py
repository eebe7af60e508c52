"""Offline reference-semantics crawl simulator — the GOLDEN ORACLE.

Re-executes, sequentially and row-at-a-time, exactly what the reference
Scrapy deployment does per spider process (SURVEY.md §3.1), with network
replaced by the fixture ``pages`` mapping:

* strict FIFO request queue per seed with ``CONCURRENT_REQUESTS_PER_DOMAIN=1``
  semantics (``settings.py:53-55``) — pop, fetch, run callback to
  completion, repeat;
* per-candidate URL-seen check against the global inserted-items set with
  query-string stripping of the CANDIDATE only (``database.py:88-98``);
* ``CLOSESPIDER_ITEMCOUNT`` budget — queue dropped the moment the Nth item
  is scraped (``immonet.py:26-28``);
* pipeline ``stopCondition``: cumulative transform/insert failures ≥ 35 set
  ``spider.stop`` at the next processed item; the spider closes at its next
  *listing* parse (``pipelines.py:363-369``, ``immonet.py:82-84``);
* ``process_item`` gates + ``transformItem``/``transformWGItem`` nested-doc
  building with its implicit required-field KeyErrors
  (``pipelines.py:132-236,360-404``);
* Telegram alert side-output for ``images && int(gesamtkosten) < 1000``
  (``pipelines.py:388-390``) — including the ``int('auf Anfrage')`` failure
  path that increments ``stopCondition`` after a successful insert.

Seeds are processed sequentially in seeds-table order; fixture URLs are
disjoint across seeds by construction, so the global seen-set gives the
same result as the reference's parallel spider fleet.

Determinism: ``run_date``/``run_ts``/``hour`` are explicit parameters
(replacing ``datetime.now()``); document ``_id`` is uuid5(url|seed) instead
of uuid4 (``pipelines.py:137``) — divergence documented, excluded from the
byte-identity invariant which covers the extracted item fields.
"""

from __future__ import annotations

import datetime
import json
import uuid
from collections import deque
from dataclasses import dataclass, field

from ..operators.portals import get_portal
from ..operators.portals.base import SeedCtx

DUP_STREAK_LIMIT = 35  # pipelines.py:26,363
ITEM_BUDGETS = {  # CLOSESPIDER_ITEMCOUNT per spider
    "immonet": 125,  # immonet.py:26-28
    "immoscout": 125,
    "immowelt": 220,  # immowelt.py:25-27
    "wgsuche": 150,  # wgsuche.py:33
}
DEFAULT_ITEM_BUDGET = 125


def canonical_item_text(item: dict) -> str:
    """The byte-identity invariant: canonical JSON of the extracted item
    (sorted keys, no spaces, non-ascii preserved)."""
    return json.dumps(
        item, sort_keys=True, ensure_ascii=False, separators=(",", ":"), default=str
    )


def strip_query(url: str) -> str:
    # database.py:91-92
    return url.split("?")[0] if "?" in str(url) else url


@dataclass
class SimResult:
    fetch_order: list = field(default_factory=list)  # (seed_id, seq, url, kind)
    items: list = field(default_factory=list)  # (seed_id, url, item, kind)
    docs: list = field(default_factory=list)  # transformed nested documents
    alerts: list = field(default_factory=list)  # telegram side-output urls
    seen: set = field(default_factory=set)  # inserted item urls (exact)
    dup_skips: list = field(default_factory=list)  # candidate urls skipped
    failures: list = field(default_factory=list)  # (seed_id, url, reason)
    # per-item pipeline effects, 1:1 with ``items`` (same append order):
    # (doc_json|None, seen_url|None, alert|None, failure|None)
    effects: list = field(default_factory=list)


def transform_item(item, stadt_row, run_ts, doc_id):
    """pipelines.py:132-236 — raises (like the reference's KeyErrors) when
    required fields are absent; caller counts that as an insert failure."""
    stadt = dict(stadt_row) if stadt_row else None
    obj = {
        "_id": doc_id,
        "immobilienTypDaten": {
            "immoRentType": item["kaufen"],
            "immoType": item["haus"],
        },
        "standortDaten": {"Stadt": stadt},
        "basisDaten": {
            "flache": item["flache"] if "flache" in item else None,
            "zimmer": item["zimmer"],
            "bezugsfreiab": item["bezugsfreiab"] if "bezugsfreiab" in item else None,
        },
        "beschreibungDaten": {"title": item["title"]},
        "fotoDaten": {"images": item["images"]},
        "url": item["url"],
        "anbieter": item["anbieter"],
        "createdAt": run_ts,
    }
    obj["standortDaten"]["Stadt"]["Stadtviertel"] = []  # TypeError if stadt None
    if "stadtvid" in item and item["stadtvid"] is not None:
        obj["standortDaten"]["Stadt"]["Stadtviertel"] = {"index": item["stadtvid"]}
    if "adresse" in item:
        obj["standortDaten"]["strasse"] = item["adresse"]
        if len(str(obj["standortDaten"]["strasse"])) > 100:
            obj["standortDaten"]["strasse"] = ""  # pipelines.py:172-174
    if item["kaufen"] == 0:
        obj["mietDaten"] = {"gesamtkosten": item["gesamtkosten"]}
    else:
        obj["kaufDaten"] = {"kaufpreis": item["gesamtkosten"]}
    ausstattung = []
    for key, _id, name in (
        ("keller", 1, "Keller"),
        ("haustier", 2, "Haustiere erlaubt"),
        ("ebk", 3, "Einbauküche"),
        ("provisionsfrei", 9, "Provisionsfrei"),
        ("garage", 4, "Garage"),
        ("terrasse", 5, "Terrasse"),
        ("garten", 10, "Garten"),
        ("balkon", 6, "Balkon"),
        ("aufzug", 7, "Aufzug"),
        ("mobliert", 11, "Möbliert"),
        ("barriefrei", 8, "Barrierefrei"),
    ):
        if key in item:
            ausstattung.append({"_id": _id, "name": name})
    if ausstattung:
        obj["ausstattungDaten"] = ausstattung
    return obj


def transform_wg_item(item, stadt_row, run_ts, doc_id):
    """pipelines.py:238-358."""
    stadt = dict(stadt_row) if stadt_row else None
    obj = {
        "_id": doc_id,
        "immobilienTypDaten": {"immoType": item["haus"], "immoRentType": 0},
        "standortDaten": {"Stadt": stadt},
        "basisDaten": {"zimmerflache": item["zimmerflache"]},
        "mietDaten": {"gesamtkosten": item["gesamtkosten"]},
        "beschreibungDaten": {"title": item["title"]},
        "fotoDaten": {"images": item["images"]},
        "url": item["url"],
        "anbieter": item["anbieter"],
        "createdAt": run_ts,
    }
    if obj["anbieter"] == "6":
        if int(obj["basisDaten"]["zimmerflache"]) > 35:
            obj["basisDaten"]["flache"] = obj["basisDaten"]["zimmerflache"]
            del obj["basisDaten"]["zimmerflache"]
    if "gesamtflache" in item:
        obj["basisDaten"]["flache"] = item["gesamtflache"]
    if "adresse" in item:
        obj["standortDaten"]["strasse"] = item["adresse"]
    if "bezugsfreiab" in item:
        obj["basisDaten"]["bezugsfreiab"] = item["bezugsfreiab"]
    obj["wgDaten"] = {}
    for k in ("anzahlf", "anzahlm", "gesuchtf", "gesuchtm"):
        if k in item:
            obj["wgDaten"][k] = item[k]
    ausstattung = []
    for key, _id, name in (
        ("keller", 1, "Keller"),
        ("haustier", 2, "Haustiere erlaubt"),
        ("ebk", 3, "Einbauküche"),
        ("provisionsfrei", 9, "Provisionsfrei"),
        ("garage", 4, "Garage"),
        ("terrasse", 5, "Terrasse"),
        ("garten", 10, "Garten"),
        ("balkon", 6, "Balkon"),
        ("aufzug", 7, "Aufzug"),
        ("mobliert", 11, "Möbliert"),
        ("barriefrei", 8, "Barrierefrei"),
    ):
        if key in item:
            ausstattung.append({"_id": _id, "name": name})
    if ausstattung:
        obj["ausstattungDaten"] = ausstattung
    return obj


def apply_item(item, stadte_by_id, run_ts):
    """The effect-producing core of ``process_item`` (pipelines.py:360-404),
    shared verbatim by the simulator and the engine's per-seed pipeline
    pass.  Returns ``(doc, seen_url, alert_url, failure)`` — note a doc may
    be "inserted" AND a failure recorded when the Telegram ``int()`` check
    raises after the insert (pipelines.py:388-397)."""
    doc = seen_url = alert = failure = None
    if "url" in item and "title" in item:
        item["createdat"] = run_ts.strftime("%Y-%m-%d %H:%M:%S")
        if "adresse" not in item and "ort" in item:
            item["adresse"] = item["ort"]
        try:
            if "stadtname" in item:
                del item["stadtname"]
            doc_id = str(uuid.uuid5(uuid.NAMESPACE_URL, "immo|" + str(item["url"])))
            stadt = stadte_by_id.get(int(item["stadtid"]))
            if item["haus"] == 2:
                doc = transform_wg_item(item, stadt, run_ts, doc_id)
            else:
                doc = transform_item(item, stadt, run_ts, doc_id)
            seen_url = str(item["url"])
            if item["images"] and "gesamtkosten" in item:
                if int(item["gesamtkosten"]) < 1000:  # may raise → failure
                    alert = item["url"]
        except Exception as e:
            failure = type(e).__name__
    return doc, seen_url, alert, failure


class _Pipeline:
    """MongoDbPipeline per spider (pipelines.py:24-404)."""

    def __init__(self, stadte_by_id, result: SimResult, run_ts):
        self.stop_condition = 0
        self.stadte = stadte_by_id
        self.res = result
        self.run_ts = run_ts

    def process_item(self, item, spider):
        if self.stop_condition >= DUP_STREAK_LIMIT:
            self.stop_condition = 0
            spider.stop = True
        doc, seen_url, alert, failure = apply_item(item, self.stadte, self.run_ts)
        if doc is not None:
            self.res.docs.append(doc)
        if seen_url is not None:
            self.res.seen.add(seen_url)
        if alert is not None:
            self.res.alerts.append(alert)
        if failure is not None:
            self.res.failures.append((spider.seed_id, item.get("url"), failure))
            self.stop_condition += 1
        # 1:1 with res.items — doc serialized exactly like the engine's
        # doc_json column (crawl.py pipeline pass) so the expected-output
        # fixture is byte-comparable to items_df()
        self.res.effects.append(
            (
                None
                if doc is None
                else json.dumps(doc, sort_keys=True, ensure_ascii=False, default=str),
                seen_url,
                alert,
                failure,
            )
        )
        return item


class _Spider:
    def __init__(self, seed_id):
        self.seed_id = seed_id
        self.stop = False


def check_dup(seen: set, url: str) -> bool:
    return strip_query(url) in seen


def simulate(pages: dict, seeds, stadte, hour=7, run_date=None, run_ts=None,
             item_budgets=None, epoch=0) -> SimResult:
    """Run the full reference crawl over fixture ``pages`` (url→body str).

    ``seeds``: iterable of dicts (seeds table rows); ``stadte``: iterable of
    dicts with id/stadt/stadtviertel.
    """
    run_date = run_date or datetime.date(2021, 5, 1)
    run_ts = run_ts or datetime.datetime(2021, 5, 1, hour, 0, 0)
    budgets = dict(ITEM_BUDGETS)
    if item_budgets:
        budgets.update(item_budgets)

    stadte_by_id = {
        int(s["id"]): {
            "id": int(s["id"]),
            "stadt": s["stadt"],
            "Stadtviertel": list(s["stadtviertel"]),
        }
        for s in stadte
    }
    res = SimResult()

    for seed in seeds:
        portal = get_portal(seed["portal"])
        ctx = SeedCtx(
            seed_id=seed["seed_id"],
            portal=seed["portal"],
            stadtid=int(seed["stadtid"]),
            stadtname=seed["stadtname"],
            haus=int(seed["haus"]),
            kaufen=int(seed["kaufen"]),
            url=seed["url"],
            chatid=seed.get("chatid"),
            hour=hour,
            run_date=run_date,
            stadtviertel=tuple(
                stadte_by_id.get(int(seed["stadtid"]), {}).get("Stadtviertel", ())
            ),
            progress_counter=int(epoch),
        )
        spider = _Spider(seed["seed_id"])
        pipeline = _Pipeline(stadte_by_id, res, run_ts)
        budget = budgets.get(seed["portal"], DEFAULT_ITEM_BUDGET)
        scraped = 0
        queue = deque()
        queue.append((seed["url"], "start", {"stadtid": ctx.stadtid}))
        seq = 0
        closed = False
        while queue and not closed:
            url, kind, meta = queue.popleft()
            body = pages.get(url)
            if body is None:
                continue  # network error → callback never runs
            res.fetch_order.append((seed["seed_id"], seq, url, kind))
            seq += 1
            if kind == "listing" and spider.stop:
                # immonet.py:82-84: the listing page IS fetched, then the
                # parse callback closes the spider — queue dropped
                break
            try:
                pr = portal.parse(kind, body, url, meta, ctx)
            except Exception:
                continue  # spider-level try/except swallows (quirk)
            if pr.stop_seed:
                break
            for link in pr.links:
                if link.dup_check and check_dup(res.seen, link.url):
                    res.dup_skips.append((seed["seed_id"], link.url))
                    continue
                queue.append((link.url, link.kind, link.meta))
            for it_dict, it_kind in pr.items:
                res.items.append((seed["seed_id"], url, dict(it_dict), it_kind))
                pipeline.process_item(dict(it_dict), spider)
                scraped += 1
                if scraped >= budget:
                    closed = True  # CLOSESPIDER_ITEMCOUNT → queue dropped
                    break
    return res


def expected_tables(res: SimResult):
    """The golden run's expected engine outputs, shaped like items_df().

    Returns ``(listings, alerts)`` row-dict lists:

    * listings — one row per scraped item: ``(seed_id, url, item_json,
      doc_json)``, ``url`` the PAGE the item was parsed from, ``item_json``
      the canonical extracted-item text (the byte-identity invariant),
      ``doc_json`` the inserted nested document or None;
    * alerts — the Telegram side-output rows ``(seed_id, url, alert)``.

    Written to the fixture dir as parquet at generate time so the
    crawl-derived queries get plain ``read_parquet`` DuckDB oracles
    (reference semantics: demo_crawl/pipelines.py:360-404)."""
    assert len(res.items) == len(res.effects), "effects must be 1:1 with items"
    listings, alerts = [], []
    for (seed_id, url, item, _kind), (doc_json, _seen, alert, _fail) in zip(
        res.items, res.effects
    ):
        listings.append(
            {
                "seed_id": seed_id,
                "url": url,
                "item_json": canonical_item_text(item),
                "doc_json": doc_json,
            }
        )
        if alert is not None:
            alerts.append({"seed_id": seed_id, "url": url, "alert": alert})
    return listings, alerts
