"""wohnungsmarkt24 portal parser — reference
``demo_crawl/spiders/wohnungsmarkt24.py``.

Quirks preserved:
* the pagination yield sits INSIDE the detail loop (wohnungsmarkt24.py:89-93)
  — it is emitted right after the first detail link; Scrapy's request
  dupefilter drops the later duplicates, so the next listing page lands at
  FIFO position 2 (fetched between the first and second detail pages).
  An empty detail list means no pagination at all.
* detail url = 'https://www.wohnungsmarkt24.de/' + href (trailing slash
  concat, wohnungsmarkt24.py:85).
* adresse = h2[@title='Daten'] text split('-')[1] — IndexError without a
  '-' → whole item dropped (wohnungsmarkt24.py:167-169).
* terrasse matches the PLURAL 'Terrassen' (wohnungsmarkt24.py:162).
* feature matches are document-global text contains.
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx, join_url

NAME = "wohnungsmarkt24"
NETLOC = "www.wohnungsmarkt24.de"
ANBIETER = "7"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    immos = x.xpath("//*[@class='headline-se-1']/a/@href").getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    nxt = x.xpath("//a[@class='nextLink slink']/@href").get()
    seq = 0
    for i, href in enumerate(immos):
        durl = "https://www.wohnungsmarkt24.de/" + href
        res.links.append(
            Link(url=durl, kind="detail", seq=seq,
                 meta={"stadtid": stadtid, "url": durl})
        )
        seq += 1
        if i == 0 and nxt:  # nested pagination yield (quirk)
            res.links.append(
                Link(url=join_url(url, nxt), kind="listing", seq=seq,
                     meta={"stadtid": ctx.stadtid}, dup_check=False)
            )
            seq += 1
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    item = {}
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    loader.add_xpath("title", "//h1[@class='headline-expose']/text()")
    item["url"] = meta.get("url", url)
    if ctx.chatid is not None:
        item["chatid"] = ctx.chatid

    bilder = x.xpath("//div[@class='carousel-inner']//div/img/@src").getall()
    item["images"] = list(bilder)

    loader.add_xpath(
        "zimmer", "//div[@class='row margin-bottom-10']//div[3]/strong/text()"
    )
    flache = x.xpath("//tr[@class='odd'][3]//td[@class='value']/text()").get()
    loader.add_value("flache", flache)

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        gesamtk = x.xpath("//tr[@class='odd'][1]//td[@class='value']/text()").get()
        loader.add_value("gesamtkosten", gesamtk)
    else:
        loader.add_value("kaufen", "1")
        loader.add_xpath("gesamtkosten", "//tr[@class='odd'][1]//td[@class='value']/text()")
        loader.add_xpath("provisionsfrei", "//text()[contains(.,'provisionsfrei')]")

    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath("grundstuck", "//tr[@class='even'][3]//td[@class='value']/text()")
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("keller", "//text()[contains(.,'Keller')]")
    loader.add_xpath("balkon", "//text()[contains(.,'Balkon')]")
    loader.add_xpath("garage", "//text()[contains(.,'Garage')]")
    loader.add_xpath("haustier", "//text()[contains(.,'Haustiere erlaubt')]")
    loader.add_xpath("barriefrei", "//text()[contains(.,'Stufenloser Zugang')]")
    loader.add_xpath("moebliert", "//text()[contains(.,'Möbliert')]")
    loader.add_xpath("terrasse", "//text()[contains(.,'Terrassen')]")

    add = x.xpath("//h2[@title='Daten']/text()").get()
    if add:
        add = add.split("-")[1]  # IndexError → item dropped (quirk)
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
    raise ValueError(f"wohnungsmarkt24: unknown page kind {kind!r}")
