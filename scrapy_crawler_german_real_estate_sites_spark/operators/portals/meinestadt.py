"""meinestadt portal parser — reference ``demo_crawl/spiders/meinestadt.py``.

JSON listing (``searchboxResults.items``) builds the item inline (DIRECT
field assignments — raw JSON values bypass the processors,
meinestadt.py:92-132), then a second hop to the detail page adds adresse /
bezugsfreiab / images (meinestadt.py:146-184).  The partially-built item
travels in the request meta → our Link.meta carries it as a dict.

Quirks preserved:
* dup check on detailUrl at listing time (meinestadt.py:87-88).
* missing adresse div → ``str(None).strip()`` = the string 'None' — truthy,
  so the fallback xpath never fires (meinestadt.py:151-155).
* ``bezugsfreiab`` only added in the adresse-not-set branch (always taken).
* equipment substring flags: Tiefgarage/Stellplatz→garage etc.
  (meinestadt.py:104-129).
* kaufen/haus go through booleanconverter (ints 0/1 map to 0/1).
"""

from __future__ import annotations

import json

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx

NAME = "meinestadt"
NETLOC = "www.meinestadt.de"
ANBIETER = "2"

_EQUIP_FLAGS = [
    ("Tiefgarage", "garage"),
    ("Garten", "garten"),
    ("Balkon", "balkon"),
    ("Personenaufzug", "aufzug"),
    ("Stellplatz", "garage"),
    ("Terrasse", "terrasse"),
    ("Einbauküche", "ebk"),
    ("Kelleranteil", "keller"),
    ("provisionsfrei", "provisionsfrei"),
]


def _parse_api(body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    data = json.loads(body)
    seq = 0
    for jsonitem in data["searchboxResults"]["items"]:
        try:
            item = {}
            loader = C.ItemLoader(item, None, C.immobilie_processors(ctx.run_date))
            item["title"] = jsonitem["title"]
            item["url"] = jsonitem["detailUrl"]
            if ctx.chatid is not None:
                item["chatid"] = ctx.chatid
            item["zimmer"] = jsonitem["rooms"]
            item["flache"] = jsonitem["livingAreaRaw"]
            item["lat"] = jsonitem["latitude"]
            item["lon"] = jsonitem["longitude"]
            item["gesamtkosten"] = jsonitem["priceRaw"]
            equip = jsonitem["equipmentAsString"]
            for marker, field in _EQUIP_FLAGS:
                if marker in equip:
                    item[field] = "1"
            if ctx.haus == 1:
                item["grundstuck"] = jsonitem["landAreaRaw"]
            loader.add_value("stadtid", ctx.stadtid)
            loader.add_value("anbieter", ANBIETER)
            loader.add_value("kaufen", ctx.kaufen)
            loader.add_value("haus", ctx.haus)
            loader.load_item()
            res.links.append(
                Link(url=jsonitem["detailUrl"], kind="detail", seq=seq,
                     meta={"item": item})
            )
            seq += 1
        except Exception:
            continue  # per-estate try/except (meinestadt.py:142-144)
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # meinestadt.py:146-184 (parse_images)
    item = dict(meta.get("item") or {})
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    if "adresse" not in item:
        item["adresse"] = str(
            x.xpath("//div[ contains(@class, 'location')]/text()").get()
        ).strip()
        if not item["adresse"]:
            item["adresse"] = x.xpath(
                '//div[@class="a-resultListMetainfoItem__text "]/text()'
            ).get()
        loader.add_xpath("bezugsfreiab", "//div[@class='section_content'][2]/p/text()")

    bilder = x.xpath(
        "//div[ contains(@class,'m-gallery__imageContainer')]"
        "/img[contains(@class,'ImageNormal')]/@data-flickity-lazyload-src"
    ).getall()
    if bilder is None or len(bilder) == 0:
        bilder = x.xpath(
            "//meta[ contains(@content, 'https://media-pics2.immowelt.org/')]/@content"
        ).getall()
    images = []
    for i in bilder:
        if not i:
            break
        images.append(i)
    item["images"] = images
    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        return _parse_api(body, url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"meinestadt: unknown page kind {kind!r}")
