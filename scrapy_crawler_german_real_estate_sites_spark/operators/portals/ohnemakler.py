"""ohne-makler portal parser — reference ``demo_crawl/spiders/ohnemakler.py``.

Quirks preserved:
* nested pagination yield (same FIFO position-2 pattern as
  wohnungsmarkt24, ohnemakler.py:90-95).
* rent without 'Pauschal': gesamtkosten = round(float(kaltmiete) +
  float(nebenkosten)) — missing either one raises (AttributeError on
  ``None.replace`` / ValueError on float) → item dropped
  (ohnemakler.py:134-144).
* ``adresse`` block: ``.get().strip()`` — missing → AttributeError → item
  dropped (ohnemakler.py:179).
* image urls prefixed with the domain (ohnemakler.py:116).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx, join_url

NAME = "ohnemakler"
NETLOC = "www.ohne-makler.net"
ANBIETER = "8"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    immos = x.xpath("//a[@class='red']/@href").getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    nxt = x.xpath("//li[@class='next']/a/@href").get()
    seq = 0
    for i, href in enumerate(immos):
        durl = "https://www.ohne-makler.net/" + href
        res.links.append(
            Link(url=durl, kind="detail", seq=seq,
                 meta={"stadtid": stadtid, "url": durl})
        )
        seq += 1
        if i == 0 and nxt:
            res.links.append(
                Link(url=join_url(url, nxt), kind="listing", seq=seq,
                     meta={"stadtid": ctx.stadtid}, dup_check=False)
            )
            seq += 1
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    item = {}
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    loader.add_xpath("title", "//h1[@class='blue']/text()")
    item["url"] = meta.get("url", url)
    if ctx.chatid is not None:
        item["chatid"] = ctx.chatid

    bilder = x.xpath("//a[contains(@class, 'pictures')]/@href").getall()
    item["images"] = ["https://www.ohne-makler.net" + i for i in bilder]

    zimmer = x.xpath("//text()[contains(.,'Zimmer (Anzahl)')]/ancestor::p/text()[2]").get()
    loader.add_value("zimmer", zimmer)
    flache = x.xpath("//text()[contains(.,'Wohnfläche')]/ancestor::p/text()[2]").get()
    loader.add_value("flache", flache)

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        gesamtk = x.xpath("//text()[contains(.,'Pauschal')]/ancestor::p/span/text()").get()
        if not gesamtk:
            # ohnemakler.py:136-142: arithmetic sum; missing parts raise →
            # item dropped by the outer except
            kaltmiete = (
                x.xpath("//text()[contains(.,'Kaltmiete')]/ancestor::p/span/text()")
                .get().replace("€", "").replace(".", "").strip()
            )
            nebenkosten = (
                x.xpath("//text()[contains(.,'Nebenkosten')]/ancestor::p/text()[2]")
                .get().replace("€", "").replace(".", "").strip()
            )
            gesamtk = float(kaltmiete) + float(nebenkosten)
        loader.add_value("gesamtkosten", str(int(round(gesamtk))))
    else:
        loader.add_value("kaufen", "1")
        loader.add_xpath(
            "gesamtkosten", "//text()[contains(.,'Kaufpreis')]/ancestor::p/span/text()"
        )
        loader.add_xpath("provisionsfrei", "//text()[contains(.,'provisionsfrei')]")

    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath(
            "grundstuck", "//text()[contains(.,'Grundstücksfläche')]/ancestor::p/text()[2]"
        )
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("keller", "//text()[contains(.,'Keller')]")
    loader.add_xpath("balkon", "//text()[contains(.,'Balkon')]")
    loader.add_xpath("garage", "//text()[contains(.,'Garage')]")
    loader.add_xpath("garten", "//text()[contains(.,'Garten')]")
    loader.add_xpath("ebk", "//text()[contains(.,'Einbauküche')]")
    loader.add_xpath("haustier", "//text()[contains(.,'Haustiere erlaubt')]")
    loader.add_xpath("barriefrei", "//text()[contains(.,'Barrierefrei')]")
    loader.add_xpath("moebliert", "//text()[contains(.,'Möbliert')]")
    loader.add_xpath("terrasse", "//text()[contains(.,'Terrasse')]")

    # missing → AttributeError → item dropped (ohnemakler.py:179)
    add = x.xpath("//div[@class='span4'][3]//h4/following::p[1]/text()").get().strip()
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
    raise ValueError(f"ohnemakler: unknown page kind {kind!r}")
