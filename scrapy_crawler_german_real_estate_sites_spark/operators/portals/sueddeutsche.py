"""sueddeutsche immobilienmarkt portal parser — reference
``demo_crawl/spiders/sueddeutsche.py``.

The listing is a JSON API page (``searchResult.result[].url`` —
sueddeutsche.py:67-73); details are HTML.  No pagination.

Quirks preserved:
* missing Wohnfläche → hasNumbers(None) TypeError → item dropped
  (sueddeutsche.py:123-124).
* buy: ANY text containing 'Provisionsfrei' → provisionsfrei=1
  (sueddeutsche.py:107-110).
* adresse = bezirk + ' (' + plz-with-commas-stripped + ') '
  (sueddeutsche.py:131-141); span[1]=plz, span[4]=bezirk.
"""

from __future__ import annotations

import json

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx

NAME = "sueddeutsche"
NETLOC = "immobilienmarkt.sueddeutsche.de"
ANBIETER = "11"


def _parse_listing(body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    data = json.loads(body)
    stadtid = meta.get("stadtid", ctx.stadtid)
    seq = 0
    for jsonitem in data["searchResult"]["result"]:
        try:
            durl = "https://immobilienmarkt.sueddeutsche.de" + jsonitem["url"]
        except Exception:
            continue  # per-item try/except (sueddeutsche.py:70-77)
        res.links.append(
            Link(url=durl, kind="detail", seq=seq, meta={"stadtid": stadtid})
        )
        seq += 1
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    item = {}
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    item["url"] = url
    if ctx.chatid is not None:
        item["chatid"] = ctx.chatid
    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath(
            "grundstuck", "(//td[@class='firstTd2']/following-sibling::td/div/text())[2]"
        )
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("title", "//*[@class='exposeTitle']/text()")

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        kosten = x.xpath(
            "(//text()[contains(.,'Miete inkl. NK')])/../../following-sibling::td/div/text()"
        ).get()
        if not kosten:
            kosten = x.xpath(
                "(//text()[contains(.,'Miete zzgl. NK')])/../../following-sibling::td/div/text()"
            ).get()
    else:
        loader.add_value("kaufen", "1")
        kosten = x.xpath(
            "(//text()[contains(.,'Kaufpreis')])/../../following-sibling::td/div/text()"
        ).get()
        provision = x.xpath("//text()[contains(.,'Provisionsfrei')]").get()
        if provision:
            loader.add_value("provisionsfrei", "1")

    if not kosten:
        return ParseResult()
    if not C.has_numbers(kosten):
        return ParseResult()
    loader.add_value("gesamtkosten", kosten)

    flache = x.xpath(
        "(//text()[contains(.,'Wohnfläche')])/../../../div[@class='value']/text()"
    ).get()
    if C.has_numbers(flache):  # raises on None → drop (quirk)
        if "," in str(flache):
            flache = flache.split(",")[0]
        loader.add_value("flache", flache)

    loader.add_xpath(
        "zimmer", "(//text()[contains(.,'Zimmeranzahl')])/../../div[@class='value']/text()"
    )

    try:
        adresse = ""
        plz = x.xpath("(//div[@class='exposeAddr']/div/span/text())[1]").get()
        bezirk = x.xpath("(//div[@class='exposeAddr']/div/span/text())[4]").get()
        if bezirk:
            adresse = bezirk
        if plz:
            adresse = adresse + " (" + str(plz).replace(",", "") + ") "
        if adresse:
            loader.add_value("adresse", adresse)
    except Exception:
        pass

    loader.add_value("stadtid", meta.get("stadtid", ctx.stadtid))
    loader.add_value("anbieter", ANBIETER)

    images = x.xpath("//ul[@class='imageSliderThumbs']//img/@src").getall()
    item["images"] = list(images)

    t = "//div[@class='hideContentInner']//text()[contains(.,'%s')]"
    loader.add_xpath("keller", t % "Keller")
    loader.add_xpath("garage", t % "Garage")
    loader.add_xpath("haustier", t % "Haustier")
    loader.add_xpath("barriefrei", t % "barrierefrei")
    loader.add_xpath("moebliert", t % "Möbliert")
    loader.add_xpath("ebk", t % "Einbauküche")
    loader.add_xpath("balkon", t % "Balkon")
    loader.add_xpath("terrasse", t % "Terrasse")
    loader.add_xpath("garten", t % "Garten")

    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        return _parse_listing(body, url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"sueddeutsche: unknown page kind {kind!r}")
