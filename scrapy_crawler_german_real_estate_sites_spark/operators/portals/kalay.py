"""kalay(do) portal parser — reference ``demo_crawl/spiders/kalay.py``.

Quirks preserved:
* detail hrefs are already absolute (kalay.py:64-71); pagination href used
  verbatim (kalay.py:77-80).
* missing Wohnfläche → ``hasNumbers(None)`` TypeError → whole item dropped
  (kalay.py:122-123 with the outer except at 175).
* missing kosten or digit-less kosten → item dropped (kalay.py:113-118).
* the address table class is matched EXACTLY with one space while the
  feature tables are matched by contains() with TWO spaces — two different
  tables (kalay.py:131 vs 154).
* ``grundstuck`` reads ebay's ``addetailslist`` class which kalay pages
  don't have → never set (kalay.py:95, bug preserved).
* anbieter is "0" (same id as immoscout — Appendix B).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx

NAME = "kalay"
NETLOC = "www.kalaydo.de"
ANBIETER = "0"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # kalay.py:63-80
    res = ParseResult()
    urls = x.xpath("//div[@class='clear-row content-container']/a/@href").getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    seq = 0
    for durl in urls:
        res.links.append(
            Link(url=durl, kind="detail", seq=seq, meta={"stadtid": stadtid})
        )
        seq += 1
    nxt = x.xpath("//a[@rel='next']/@href").getall()
    if nxt:
        res.links.append(
            Link(url=nxt[0], kind="listing", seq=seq,
                 meta={"stadtid": ctx.stadtid}, dup_check=False)
        )
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # kalay.py:85-173
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

    loader.add_xpath("title", "//h1[@id='exposeHeadline']/text()")

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        kosten = x.xpath(
            "(//text()[contains(.,'Warmmiete')])/../following-sibling::td/span/text()"
        ).get()
    else:
        loader.add_value("kaufen", "1")
        kosten = x.xpath(
            "(//text()[contains(.,'Kaufpreis')])/../following-sibling::td/span/text()"
        ).get()
        loader.add_xpath("provisionsfrei", "//text()[contains(.,'Provisionsfrei')]")

    if not kosten:
        return ParseResult()  # kalay.py:113-115
    if not C.has_numbers(kosten):
        return ParseResult()  # kalay.py:116-118
    loader.add_value("gesamtkosten", kosten)

    flache = x.xpath(
        "//div[@class='general-info']//text()[contains(.,'Wohnfläche')]/../preceding-sibling::span/text()"
    ).get()
    if C.has_numbers(flache):  # raises on None → item dropped (quirk)
        if "," in str(flache):
            flache = flache.split(",")[0]
        loader.add_value("flache", flache)

    loader.add_xpath(
        "zimmer",
        "//div[@class='general-info']//text()[contains(.,'Zimmer')]/../preceding-sibling::span/text()",
    )

    try:
        stadt_plz = x.xpath(
            "(//table[@class='ad-info estate estate-content']//td[@class='label'])[1]/following-sibling::td/span/text()"
        ).get()
        strasse = x.xpath(
            "(//table[@class='ad-info estate estate-content']//td[@class='label'])[2]/following-sibling::td/span/text()"
        ).get()
        adresse = strasse + ", " + stadt_plz  # TypeError when missing → skipped
        if adresse:
            loader.add_value("adresse", adresse)
    except Exception:
        pass  # kalay.py:136-137

    loader.add_value("stadtid", meta.get("stadtid", ctx.stadtid))
    loader.add_value("anbieter", ANBIETER)

    images = x.xpath(
        "//img[contains(@class, 'gallery-cell')]/@data-flickity-lazyload"
    ).getall()
    item["images"] = list(images)

    t = "//table[contains(@class, 'ad-info estate  estate-content')]//text()[contains(.,'%s')]"
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
        return _parse_listing(doc(body), url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"kalay: unknown page kind {kind!r}")
