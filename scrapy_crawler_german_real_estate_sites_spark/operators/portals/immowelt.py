"""immowelt portal parser — reference ``demo_crawl/spiders/immowelt.py``.

The checked-in spider cannot construct (``DataBase.create_conn`` does not
exist — immowelt.py:53 vs database.py) and calls two DB helpers with stale
MySQL-era signatures (``checkIfInDupUrl(conn, url)`` immowelt.py:185,
``extractAdresse(conn, add, 1, stadtid)`` immowelt.py:301).  We implement
the spider's dataflow with those calls repaired to the current signatures
(documented divergence); every OTHER quirk is preserved:

* Selenium listing walk: each page with a next link contributes only its
  FIRST expose href to the accumulated ``start_urls`` before paginating
  (the next-page check sits inside the elem loop with an early return —
  immowelt.py:165-180); the final page (no ``nlbPlus``) re-yields the whole
  accumulated list once per remaining elem (the else branch runs per
  iteration — immowelt.py:182-192), producing the reference's quadratic
  duplicate detail fetches (dont_filter=True).
* pagination dead-end: a 6th page that still has a next link is never
  processed (``pagesDone <= 5 or not next_page`` — immowelt.py:149).
* href dedup compares FULL hrefs against stored STRIPPED urls
  (immowelt.py:166-171) — query-bearing hrefs re-append their stripped url.
* title = ``str(list).encode`` → quotes survive remove_dot
  (immowelt.py:209-210).
* any detail page with ≥1 carousel image collects undeclared ``bildN``
  fields → load_item KeyError → ITEM DROPPED (immowelt.py:218-236); only
  image-less exposés produce items.
* grundstuck/typ/bezugsfreiab(buy) select ELEMENTS (string-value used).
* stale-request epoch drop (D7, immowelt.py:200-204) — detail requests
  carry ``progressCounter`` in meta (immowelt.py:186); a response whose
  counter differs from the current instance's (``ctx.progress_counter``,
  i.e. the engine run's ``epoch``) drops the item before extraction.
  Exercised by resuming a checkpoint under a bumped epoch
  (tests/test_epoch.py).
* CLOSESPIDER_ITEMCOUNT = 220 (immowelt.py:25-27).
"""

from __future__ import annotations

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc, doc
from .base import Link, ParseResult, SeedCtx

NAME = "immowelt"
NETLOC = "www.immowelt.de"
ANBIETER = "1"

MAX_PAGES = 5  # immowelt.py:149


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    start_urls = list(meta.get("start_urls", []))
    pages_done = int(meta.get("pagesDone", 1))
    next_page = x.xpath("//a[@id='nlbPlus']/@href").getall()
    if not (pages_done <= MAX_PAGES or not next_page):
        return res  # dead-end quirk (immowelt.py:149)
    elems = x.xpath("//a[contains(@href, 'expose')]/@href").getall()
    seq = 0
    for href in elems:
        if href not in start_urls:
            work = href
            if "?" in str(href):
                work = str(href).split("?")[0].replace("?", "")
            start_urls.append(work)
        if next_page:
            pages_done += 1
            res.links.append(
                Link(
                    url=str(ctx.url) + "&cp=" + str(pages_done),
                    kind="listing",
                    seq=seq,
                    meta={"start_urls": start_urls, "pagesDone": pages_done},
                    dup_check=False,
                )
            )
            return res
        else:
            # last page: the whole accumulated list is yielded once per
            # remaining elem (immowelt.py:182-192)
            for durl in start_urls:
                res.links.append(
                    Link(url=durl, kind="detail", seq=seq,
                         # immowelt.py:186 — every detail request carries
                         # the spider instance's progressCounter (D7 epoch)
                         meta={"stadtid": ctx.stadtid,
                               "progressCounter": ctx.progress_counter})
                )
                seq += 1
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # D7 stale-request drop (immowelt.py:200-204): a detail response whose
    # request meta carries a progressCounter from an OLDER spider instance
    # (previous run epoch) is a late arrival — the page was fetched, but
    # DropItem fires before extraction, so no item and no links result.
    if int(meta.get("progressCounter", ctx.progress_counter)) != ctx.progress_counter:
        return ParseResult()
    item = {}
    procs = C.immobilie_processors(ctx.run_date)
    loader = C.ItemLoader(item, x, procs)
    for info in list(x.xpath("//div[@class='quickfacts iw_left']")):
        sub = XDoc(info)
        loader = C.ItemLoader(item, sub, procs)
        title = x.xpath(".//h1/text()").getall()  # response-scoped
        loader.add_value("title", str(title).encode("utf-8"))
        loader.add_xpath("flache", ".//div[@class='hardfact '][2]/text()")
        loader.add_xpath("zimmer", ".//div[@class='hardfact rooms']/text()")
        loader.add_xpath("grundstuck", ".//div[@class='hardfact '][3]")

    # bildN: undeclared fields; any carousel image → load_item KeyError →
    # item dropped (immowelt.py:218-236)
    for i in range(1, 8):
        content = x.xpath(f"//div[@class='carousel-item'][{i}]/img/@src").get()
        if "App_Themes" in str(content):
            xp = f"//div[@class='carousel-item'][{i}]/img/@data-src"
        else:
            xp = f"//div[@class='carousel-item'][{i}]/img/@src"
        loader.add_xpath(f"bild{i}", xp)
    loader.load_item()  # raises when bildN non-empty → dispatcher drops

    loader = C.ItemLoader(item, x, procs)
    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        gesamtmiete = x.xpath("//div[text() = 'Warmmiete ']/../div[2]").get()
        if gesamtmiete:
            loader.add_xpath("gesamtkosten", "//div[text() = 'Warmmiete ']/../div[2]/text()")
        else:
            loader.add_xpath(
                "gesamtkosten",
                "//strong[text() = 'Warmmiete ']/../../div[@class='datacontent iw_right']/strong/text()",
            )
        loader.add_xpath("kaltmiete", "//div[@class='datacontent iw_right']/strong/text()")
        loader.add_xpath("nebenkosten", "//div[contains(text(),'Nebenkosten')]/../div[2]/text()")
        loader.add_xpath("gesamtkosten", "//div[text() = 'Warmmiete ']/../div[2]/text()")
        loader.add_xpath(
            "bezugsfreiab", "//div[2]/div[@class='section_content iw_right']/p/strong/text()"
        )
    else:
        loader.add_value("kaufen", "1")
        loader.add_xpath("kaltmiete", "//div[@class='datacontent iw_right']/strong/text()")
        loader.add_xpath("provisionsfrei", "//strong[contains(text(),'provisionsfrei')]")
        loader.add_xpath("bezugsfreiab", "//div[@class='section_content iw_right']/p[2]")

    loader.add_value("haus", "1" if ctx.haus == 1 else "0")
    loader.load_item()

    loader = C.ItemLoader(item, x, procs)
    loader.add_xpath("terrasse", "//span[contains(text(),'Terrasse')]")
    loader.add_xpath("keller", "//span[contains(text(),'Kelleranteil')]")
    loader.add_xpath("garten", "//span[contains(text(),'Garten')]")
    loader.add_xpath("ebk", "//span[contains(text(),'Einbauküche')]")
    add = x.xpath("//div[@class='location']/span/text()").getall()
    loader.add_value("adresse", str(add).encode("utf-8"))
    loader.add_xpath("aufzug", "//span[contains(text(),'Personenaufzug')]")
    loader.add_xpath("balkon", "//span[contains(text(),'Balkon')]")
    loader.add_xpath("typ", "//div[2]/div[@class='section_content iw_right']/p/text()")
    loader.add_xpath("barriefrei", "//span[contains(text(),'barrierefrei')]")
    loader.add_xpath("haustier", "//span[contains(text(),'Haustiere erlaubt')]")
    loader.add_xpath("garage", "//span[contains(text(),'Stellplatz')]")
    url_v = x.xpath("//input[@class='js-endlink-input']/@value").get()
    loader.add_value("url", url_v)
    loader.add_value("stadtid", ctx.stadtid)
    loader.add_value("anbieter", ANBIETER)
    loader.add_value("stadtname", ctx.stadtname)

    # repaired ExtractViertel call (immowelt.py:300-305): viertel=str(add)
    # never matches a district → None → nothing added
    if add:
        idx = ctx.viertel_index(str(add))
        stadtvid = idx if idx else None
        loader.add_value("stadtvid", stadtvid)
    else:
        loader.add_value("stadtvid", 0)

    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        return _parse_listing(doc(body), url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"immowelt: unknown page kind {kind!r}")
