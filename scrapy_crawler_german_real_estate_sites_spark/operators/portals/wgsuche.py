"""wg-suche portal parser — reference ``demo_crawl/spiders/wgsuche.py``.

JSON list (``result[].id``) → per-offer second API hop → WGItem
(wgsuche.py:57-127).  No dup check anywhere; CLOSESPIDER_ITEMCOUNT=150.

Quirks preserved:
* ``transItem['images'] = []`` initialisation sits INSIDE the
  ``if "furnished"`` block (wgsuche.py:120-122) — offers without
  'furnished' KeyError on images.append → item dropped.
* adresse: direct assignments (borough, ', '+street, +streetNumber) are
  OVERRIDDEN by the collected loader value street+' '+number when street
  exists (TakeFirst on first add — wgsuche.py:116-119).
* wantedAmountEven adds gesuchtm/f = 1 only when the earlier adds didn't
  fire (TakeFirst).
* haus=2 → the WG document transform path (pipelines.py:382-383).
"""

from __future__ import annotations

import json

from ...functions import cleaners as C
from .base import Link, ParseResult, SeedCtx

NAME = "wgsuche"
NETLOC = "api.wg-suche.de"
ANBIETER = "5"


def _parse_list(body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    data = json.loads(body)
    seq = 0
    for jsonitem in data["result"]:
        api_url = "https://api.wg-suche.de/v1_0/offer/" + str(jsonitem["id"])
        res.links.append(
            Link(url=api_url, kind="detail", seq=seq, meta={}, dup_check=False)
        )
        seq += 1
    return res


def _parse_offer(body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    j = json.loads(body)
    item = {}
    loader = C.ItemLoader(item, None, C.wg_processors(ctx.run_date),
                          fields=C.WG_FIELDS)
    loader.add_value("title", j["title"])
    item["haus"] = 2
    item["anbieter"] = ANBIETER
    item["url"] = "https://www.wg-suche.de/angebot/" + str(j["id"])
    item["stadtid"] = ctx.stadtid

    loader.add_value("gesamtkosten", j["rent"])
    if "flatSize" in j:
        loader.add_value("gesamtflache", j["flatSize"])
    if "size" in j:
        loader.add_value("zimmerflache", j["size"])
    if "borough" in j:
        item["adresse"] = j["borough"]
    if "adresse" not in item:
        item["adresse"] = ""
    if "street" in j:
        item["adresse"] = item["adresse"] + ", " + str(j["street"])
    if "streetNumber" in j:
        item["adresse"] = item["adresse"] + str(j["streetNumber"])

    if "from" in j:
        loader.add_value("bezugsfreiab", j["from"])
    if "membersWomanCount" in j:
        loader.add_value("anzahlf", j["membersWomanCount"])
    if "membersManCount" in j:
        loader.add_value("anzahlm", j["membersManCount"])
    if "wantedAmountFemale" in j:
        loader.add_value("gesuchtf", j["wantedAmountFemale"])
    if "wantedAmountMale" in j:
        loader.add_value("gesuchtm", j["wantedAmountMale"])
    if "wantedAmountEven" in j:
        loader.add_value("gesuchtm", 1)
        loader.add_value("gesuchtf", 1)
    if "garden" in j:
        loader.add_value("garten", j["garden"])
    if "balcony" in j:
        loader.add_value("balkon", j["balcony"])
    if "elevator" in j:
        loader.add_value("aufzug", j["elevator"])
    if "barrierFree" in j:
        loader.add_value("barriefrei", j["barrierFree"])
    if "street" in j and "streetNumber" in j:
        loader.add_value("adresse", j["street"] + " " + j["streetNumber"])
    if "street" in j:
        loader.add_value("adresse", j["street"])
    if "furnished" in j:
        loader.add_value("moebliert", j["furnished"])
        item["images"] = []  # indentation quirk (wgsuche.py:120-122)
    for image in j["images"]:
        item["images"].append(image["urls"]["ORIGINAL"]["url"])  # may KeyError
    return ParseResult(item=loader.load_item(), item_kind="wg")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        return _parse_list(body, url, meta, ctx)
    if kind == "detail":
        return _parse_offer(body, url, meta, ctx)
    raise ValueError(f"wgsuche: unknown page kind {kind!r}")
