"""berlin.de portal parser — reference ``demo_crawl/spiders/berlin.py``.

Quirks preserved:
* the buy branch evaluates a MALFORMED XPath
  (``(//text()[contains(.,'Courtage:')])xt']/text()`` — berlin.py:111);
  the evaluation error is swallowed by the outer except → EVERY kaufen=1
  item is dropped.  Our xpath engine raises on the same string, producing
  the same outcome.
* ``adresse`` NameErrors when strasse is missing but bezirk present
  (berlin.py:138-141) — adresse skipped via the inner except.
* missing Wohnfläche → hasNumbers(None) TypeError → item dropped.
* pagination uses the SECOND rel=next anchor (berlin.py:76-79).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx

NAME = "berlin"
NETLOC = "www.berlin.de"
ANBIETER = "10"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    urls = x.xpath("//article/h3/a/@href").getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    seq = 0
    for href in urls:
        res.links.append(
            Link(url="https://www.berlin.de" + href, kind="detail", seq=seq,
                 meta={"stadtid": stadtid})
        )
        seq += 1
    nxt = x.xpath("(//a[@rel='next']/@href)[2]").get()
    if nxt:
        res.links.append(
            Link(url="https://www.berlin.de" + nxt, kind="listing", seq=seq,
                 meta={"stadtid": ctx.stadtid}, dup_check=False)
        )
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
            "grundstuck",
            "(//text()[contains(.,'Gesamtfläche')])/../../span[@class='text']/text()",
        )
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("title", "//*[@class='heading--article']/text()")

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        kosten = x.xpath(
            "(//text()[contains(.,'Warm-Miete')])/../../span[@class='text']/text()"
        ).get()
        if not kosten:
            kosten = x.xpath(
                "(//text()[contains(.,'Netto-Kaltmiete')])/../../span[@class='text']/text()"
            ).get()
    else:
        loader.add_value("kaufen", "1")
        kosten = x.xpath(
            "(//text()[contains(.,'Kaufpreis')])[2]/../../span[@class='text']/text()"
        ).get()
        # berlin.py:111 — malformed XPath: raises, outer except drops item
        x.xpath("(//text()[contains(.,'Courtage:')])xt']/text()").get()

    if not kosten:
        return ParseResult()
    if not C.has_numbers(kosten):
        return ParseResult()
    loader.add_value("gesamtkosten", kosten)

    flache = x.xpath(
        "(//text()[contains(.,'Wohnfläche')])/../../span[@class='text']/text()"
    ).get()
    if C.has_numbers(flache):  # raises on None → drop (quirk)
        if "," in str(flache):
            flache = flache.split(",")[0]
        loader.add_value("flache", flache)

    loader.add_xpath(
        "zimmer", "(//text()[contains(.,'Zimmer')])/../../span[@class='text']/text()"
    )

    try:
        strasse = x.xpath("//*[@class='street-address']/text()").get()
        plz = x.xpath("//*[@class='postal-code']/text()").get()
        bezirk = x.xpath("//*[@class='locality']/text()").get()
        adresse = None
        if strasse:
            adresse = strasse + ", "
        if bezirk:
            adresse = adresse + " " + bezirk  # TypeError if strasse missing
        if plz:
            adresse = adresse + " (" + plz + ") "
        if adresse:
            loader.add_value("adresse", adresse)
    except Exception:
        pass  # berlin.py:146-147

    loader.add_value("stadtid", meta.get("stadtid", ctx.stadtid))
    loader.add_value("anbieter", ANBIETER)

    images = x.xpath(
        "//img[contains(@data-src, 'immobilienscout24.de')]/@data-src"
    ).getall()
    item["images"] = list(images)

    t = "//div[@id='expose']//text()[contains(.,'%s')]"
    loader.add_xpath("keller", t % "Keller")
    loader.add_xpath("garage", t % "Garage")
    loader.add_xpath("haustier", t % "Haustiere")
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
    raise ValueError(f"berlin: unknown page kind {kind!r}")
