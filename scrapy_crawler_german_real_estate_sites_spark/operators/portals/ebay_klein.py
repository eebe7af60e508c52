"""ebay-kleinanzeigen portal parser — reference
``demo_crawl/spiders/ebay-klein.py``.

Quirks preserved:
* pagination href is concatenated to the SEED url, not the current page
  (ebay-klein.py:81): ``url = userToStadt['ebay'] + next_page.get()``.
* ``kosten`` of None raises in ``hasNumbers`` → item dropped; digit-less
  kosten → dropped (ebay-klein.py:110-113).
* '.' is stripped from kosten/flache BEFORE the loader's German-locale
  parse (ebay-klein.py:114-121) — so "1.200 €" becomes "1200".
* checktag features come from text-node contains() matches
  (ebay-klein.py:138-155); ``moebliert`` uses booleanWGconverter via the
  item schema, so a matched tag gives 0 (True-only converter, quirk).
* no spider-stop check in parse (no ``self.stop`` gate).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx

NAME = "ebay"
NETLOC = "www.ebay-kleinanzeigen.de"
ANBIETER = "6"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # ebay-klein.py:63-82
    res = ParseResult()
    immos = x.xpath("//a[@class='ellipsis']/@href").getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    seq = 0
    for href in immos:
        durl = "https://www.ebay-kleinanzeigen.de" + href
        res.links.append(
            Link(url=durl, kind="detail", seq=seq, meta={"stadtid": stadtid})
        )
        seq += 1
    nxt = x.xpath("//a[@class='pagination-next']/@href").getall()
    if nxt:
        res.links.append(
            Link(
                url=ctx.url + str(nxt[0]),  # seed-url concat (quirk)
                kind="listing",
                seq=seq,
                meta={"stadtid": ctx.stadtid},
                dup_check=False,
            )
        )
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # ebay-klein.py:87-157
    item = {}
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    item["url"] = url
    if ctx.chatid is not None:
        item["chatid"] = ctx.chatid

    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath(
            "grundstuck",
            "//ul[@class='addetailslist']//text()[contains(.,'Grundstücksfläche')]/../span/text()",
        )
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("title", "//h1[@id='viewad-title']/text()")
    loader.add_value("kaufen", "0" if ctx.kaufen == 0 else "1")

    kosten = x.xpath("//h2[@id='viewad-price']/text()").get()
    if not C.has_numbers(kosten):  # raises on None → item dropped (quirk)
        return ParseResult()
    if "." in str(kosten):
        kosten = kosten.replace(".", "")
    loader.add_value("gesamtkosten", kosten)

    flache = x.xpath(
        "//ul[@class='addetailslist']//text()[contains(.,'Wohnfläche')]/../span/text()"
    ).get()
    if "." in str(flache):
        flache = flache.replace(".", "")
    loader.add_value("flache", flache)
    loader.add_xpath(
        "zimmer", "//ul[@class='addetailslist']//text()[contains(.,'Zimmer')]/../span/text()"
    )
    loader.add_xpath("adresse", "//span[@id='viewad-locality']/text()")

    loader.add_value("stadtid", meta.get("stadtid", ctx.stadtid))
    loader.add_value("anbieter", ANBIETER)

    images = x.xpath(
        "//div[contains(@class, 'galleryimage-element')]/img/@src"
    ).getall()
    item["images"] = list(images)

    loader.add_xpath("keller", "//ul[@class='checktaglist']//text()[contains(.,'Keller')]")
    loader.add_xpath("garage", "//ul[@class='checktaglist']//text()[contains(.,'Garage')]")
    loader.add_xpath(
        "haustier", "//ul[@class='checktaglist']//text()[contains(.,'Haustiere erlaubt')]"
    )
    loader.add_xpath(
        "barriefrei", "//ul[@class='checktaglist']//text()[contains(.,'Stufenloser Zugang')]"
    )
    loader.add_xpath(
        "moebliert", "//ul[@class='checktaglist']//text()[contains(.,'Möbliert')]"
    )
    loader.add_xpath("ebk", "//ul[@class='checktaglist']//text()[contains(.,'Einbauküche')]")
    loader.add_xpath("balkon", "//ul[@class='checktaglist']//text()[contains(.,'Balkon')]")
    loader.add_xpath("terrasse", "//ul[@class='checktaglist']//text()[contains(.,'Terrasse')]")
    loader.add_xpath(
        "provisionsfrei", "//text()[contains(.,'Keine zusätzliche Käuferprovision')]"
    )

    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        # start_requests goes straight to parse (ebay-klein.py:51)
        return _parse_listing(doc(body), url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"ebay: unknown page kind {kind!r}")
