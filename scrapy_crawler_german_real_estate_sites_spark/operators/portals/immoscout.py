"""immoscout portal parser — reference ``demo_crawl/spiders/immoscout.py``.

Entry divergence (documented): the reference's ``detectPageStart`` is dead
code — it prints and returns before yielding (immoscout.py:81-83), so the
production spider never crawls.  To exercise the spider's actual parse
logic (E3/F3), seeds for this portal enter directly at the listing
callback: seed kind = 'listing'.

Quirks preserved:
* the criteriagroup loop recreates the loader per div — only the LAST
  ``criteriagroup criteria-group--two-columns`` div's dd values survive
  (immoscout.py:128-145); with no such div, title/url are never added
  (→ item fails the url+title pipeline gate).
* images is a list of single-element LISTS (``extract()`` appended whole,
  immoscout.py:149-152).
* pagination is skipped entirely when a listing page has no detail links
  (``next_page`` referenced before assignment → swallowed NameError,
  immoscout.py:106-117).
* ``adresse`` embeds ``str(list)`` with brackets/quotes before the
  whitespacewg cleanup (immoscout.py:232-234).
* terrasse AND balkon both read the balkon-terrasse label
  (immoscout.py:209-212).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx, join_url

NAME = "immoscout"
NETLOC = "www.immobilienscout24.de"
ANBIETER = "0"


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # immoscout.py:93-121
    res = ParseResult()
    immos = x.xpath(
        "//a[contains(@class,'result-list-entry__brand-title-container')]/@href"
    ).getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    seq = 0
    next_page_seen = False
    for href in immos:
        if "https://" in str(href):
            continue
        durl = "https://www.immobilienscout24.de" + href
        res.links.append(
            Link(url=durl, kind="detail", seq=seq, meta={"stadtid": stadtid})
        )
        seq += 1
        next_page_seen = True  # next_page assigned inside the loop (quirk)
    if next_page_seen:
        nxt = x.xpath("//a[@data-is24-qa='paging_bottom_next']/@href").getall()
        if nxt:
            res.links.append(
                Link(
                    url=join_url(url, nxt[0]),
                    kind="listing",
                    seq=seq,
                    meta={"stadtid": ctx.stadtid},
                    dup_check=False,
                )
            )
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # immoscout.py:123-256
    item = {}
    procs = C.immobilie_processors(ctx.run_date)
    loader = C.ItemLoader(item, x, procs)

    groups = list(x.xpath("//div[@class='criteriagroup criteria-group--two-columns']"))
    for info in groups:
        sub = XDoc(info)
        loader = C.ItemLoader(item, sub, procs)  # fresh loader per div (quirk)
        loader.add_xpath("title", "//h1[@id='expose-title']/text()")  # absolute
        loader.add_xpath("typ", ".//dd[@class='is24qa-typ grid-item three-fifths']/text()")
        loader.add_xpath(
            "bezugsfreiab",
            ".//dd[@class='is24qa-bezugsfrei-ab grid-item three-fifths']/text()",
        )
        loader.add_xpath(
            "haustier", ".//dd[@class='is24qa-haustiere grid-item three-fifths']/text()"
        )
        # reference reads garage from response (document scope), immoscout.py:138
        garage = x.xpath(
            ".//dd[@class='is24qa-garage-stellplatz grid-item three-fifths']/text()"
        ).getall()
        if garage:
            loader.add_xpath("garage", "1")
        loader.add_xpath("url", "//link[@rel='canonical']/@href")
    loader.load_item()

    images = []
    for i in range(1, 8):
        bild = x.xpath(f"(//img[@class='sp-image ']/@data-src)[{i}]").getall()
        if not bild:
            break
        images.append(bild)  # whole list appended (quirk)
    item["images"] = images

    loader.add_xpath("zimmer", "//dd[@class='is24qa-zimmer grid-item three-fifths']/text()")

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        kaltmiete = x.xpath(
            "//div[@class='is24qa-kaltmiete is24-value font-semibold']/text()"
        ).get()
        loader.add_value("kaltmiete", kaltmiete)
        flache = x.xpath(
            "//div[@class='is24qa-flaeche is24-value font-semibold']/text()"
        ).get()
        if flache:
            if "," in flache:
                flache = str(flache).split(",")[0]
        loader.add_value("flache", flache)
        loader.add_xpath(
            "nebenkosten",
            "//dd[@class='is24qa-nebenkosten grid-item three-fifths']/text()[2]",
        )
        gesamtk = x.xpath(
            "//dd[@class='is24qa-gesamtmiete grid-item three-fifths font-bold']/text()"
        ).get()
        if not gesamtk:
            gesamtk = kaltmiete
        loader.add_value("gesamtkosten", gesamtk)
        loader.add_xpath(
            "gesamtkosten",
            "//dd[@class='is24qa-gesamtmiete grid-item three-fifths font-bold']/text()",
        )
    else:
        loader.add_value("kaufen", "1")
        loader.add_xpath(
            "gesamtkosten",
            "//div[@class='is24qa-kaufpreis is24-value font-semibold is24-preis-value']/text()",
        )
        loader.add_xpath(
            "flache", "//dd[@class='is24qa-wohnflaeche-ca grid-item three-fifths']/text()"
        )
        loader.add_xpath(
            "provisionsfrei", "//span[@class='is24qa-provisionsfrei-label']/text()"
        )

    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath(
            "grundstuck", "//dd[@class='is24qa-grundstueck-ca grid-item three-fifths']/text()"
        )
    else:
        loader.add_value("haus", "0")
    loader.load_item()

    for node in list(x.xpath("//div[@class='criteriagroup boolean-listing padding-top-l']")):
        sub = XDoc(node)
        loader = C.ItemLoader(item, sub, procs)
        loader.add_xpath("terrasse", ".//span[@class='is24qa-balkon-terrasse-label']/text()")
        loader.add_xpath("balkon", ".//span[@class='is24qa-balkon-terrasse-label']/text()")
        loader.add_xpath("keller", ".//span[@class='is24qa-keller-label']/text()")
        loader.add_xpath("garten", ".//span[@class='is24qa-garten-mitbenutzung-label']/text()")
        ebk = x.xpath("//span[@class='is24qa-einbaukueche-label']/text()").getall()
        if ebk:
            loader.add_value("ebk", "1")
        loader.add_xpath("aufzug", ".//span[@class='is24qa-personenaufzug-label']/text()")
        loader.add_xpath("barriefrei", ".//span[@class='is24qa-stufenloser-zugang-label']/text()")

    add = x.xpath("//span[@class='block font-nowrap print-hide']/text()").getall()
    viertel = x.xpath('//ul[@class="breadcrumb__item--current"]/preceding::a[1]').get()
    loader.add_value("ort", viertel)
    if add:
        add = str(add) + ", " + str(viertel)
        loader.add_value("adresse", str(add).encode("utf-8"))

    viertel = x.xpath(
        '//ul[@class="breadcrumb__item--current"]/preceding::a[1]/text()'
    ).get()
    if viertel:
        # ExtractViertel.extractAdresse: index 0 is falsy → None
        # (ExtractViertel.py:33-39)
        idx = ctx.viertel_index(str(viertel))
        stadtvid = idx if idx else None
        loader.add_value("stadtvid", stadtvid)

    loader.add_value("stadtid", ctx.stadtid)
    loader.add_value("anbieter", ANBIETER)
    loader.add_value("stadtname", ctx.stadtname)

    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        # detectPageStart is dead code (immoscout.py:81-83): seeds enter at
        # the listing callback
        return _parse_listing(doc(body), url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"immoscout: unknown page kind {kind!r}")
