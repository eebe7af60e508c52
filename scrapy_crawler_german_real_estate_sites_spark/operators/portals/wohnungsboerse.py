"""wohnungsboerse portal parser — reference
``demo_crawl/spiders/wohnungsboerse.py``.

Quirks preserved:
* the listing-page thumbnail travels to the detail item via request meta
  and is PREPENDED to images even when None (wohnungsboerse.py:85,116) —
  ``images = [null, …]`` in the canonical item.
* pagination is commented out (wohnungsboerse.py:93-97) — one listing page
  per seed.
* buy: ANY text containing 'Provision' → provisionsfrei=1
  (wohnungsboerse.py:144-147).
* conditional domain prefix only when 'wohnungsboerse' not in href
  (wohnungsboerse.py:86-87).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, XList, doc
from .base import Link, ParseResult, SeedCtx

NAME = "wohnungsboerse"
NETLOC = "www.wohnungsboerse.net"
ANBIETER = "9"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    stadtid = meta.get("stadtid", ctx.stadtid)
    seq = 0
    for node in list(x.xpath("//a[contains(@href,'immodetail')]")):
        sub = XDoc(node)
        href = sub.xpath("@href").get()
        image = sub.xpath("img/@data-src").get()
        durl = href if "wohnungsboerse" in href else "https://www.wohnungsboerse.net" + href
        res.links.append(
            Link(url=durl, kind="detail", seq=seq,
                 meta={"stadtid": stadtid, "url": durl, "imageurl": image})
        )
        seq += 1
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    item = {}
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    loader.add_xpath("title", "//h2[@class='dotdotdot']/text()")
    item["url"] = meta.get("url", url)
    imageurl = meta.get("imageurl")
    if ctx.chatid is not None:
        item["chatid"] = ctx.chatid

    bilder = x.xpath(
        "//img[contains(@src, 'https://cdn.wohnungsboerse.net/img/thumbs')]/@src"
    ).getall()
    item["images"] = [imageurl] + list(bilder)  # None kept (quirk)

    loader.add_xpath("zimmer", "//dt[contains(text(),'ZIMMER')]//ancestor::dl/dd/text()")
    loader.add_xpath("flache", "//dt[contains(text(),'FLÄCHE')]//ancestor::dl/dd/text()")

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        gesamtk = x.xpath(
            "//div/b[contains(text(),'Gesamt')]/../following-sibling::div[1]/div/text()"
        ).get()
        loader.add_value("gesamtkosten", gesamtk)
    else:
        loader.add_value("kaufen", "1")
        loader.add_xpath(
            "gesamtkosten", "//dt[contains(text(),'KAUFPREIS')]/following-sibling::dd[1]/text()"
        )
        provisionfrei = x.xpath("//text()[contains(.,'Provision')]").get()
        if provisionfrei:
            loader.add_value("provisionsfrei", "1")

    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath(
            "grundstuck",
            "//div[contains(text(),'Grundstücksfläche:')]//following-sibling::div[1]/text()",
        )
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("keller", "//text()[contains(.,'Keller')]")
    loader.add_xpath("balkon", "//text()[contains(.,'Balkon')]")
    loader.add_xpath("garage", "//text()[contains(.,'Garage')]")
    loader.add_xpath("haustier", "//text()[contains(.,'Haustiere erlaubt')]")
    loader.add_xpath("barriefrei", "//text()[contains(.,'Stufenloser Zugang')]")
    loader.add_xpath("moebliert", "//text()[contains(.,'Möbliert')]")
    loader.add_xpath("terrasse", "//text()[contains(.,'Terrasse')]")

    add = x.xpath("//div[@class='mb-2 mb-lg-3 pl-3 pl-lg-0']/text()").get()
    if add:
        loader.add_value("adresse", str(add).encode("utf-8"))

    loader.add_value("stadtid", ctx.stadtid)
    loader.add_value("anbieter", ANBIETER)
    loader.add_value("stadtname", ctx.stadtname)

    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        return _parse_listing(doc(body), url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"wohnungsboerse: unknown page kind {kind!r}")
