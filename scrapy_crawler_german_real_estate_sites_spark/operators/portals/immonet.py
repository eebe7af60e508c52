"""immonet portal parser — faithful re-expression of the reference spider
``demo_crawl/spiders/immonet.py`` (cited per block below).

Page kinds:
* ``start``   — the seed URL; reference ``detectPageStart`` reads the
  pagination widget and picks a start page by hour (immonet.py:76-79,306-326).
* ``listing`` — result page; emits detail links (with ortsviertel meta) and
  the next-page link (immonet.py:81-125).
* ``detail``  — expose page; full field extraction (immonet.py:127-299).

Quirks preserved on purpose (they define the golden output):
* ``CloseSpider`` raised when ``index >= foundImmos`` is swallowed by the
  spider's own ``except Exception`` (immonet.py:110-119) — so the remaining
  details of the page are skipped (index never increments again) but
  pagination still runs.
* a ``viertelList`` shorter than the detail-link list IndexErrors the same
  way — remaining details skipped, pagination continues.
* ``flache`` falls back to the literal string ``'None'`` when ``#areaid_1``
  is missing (``str(None).strip().split('.')[0]`` — immonet.py:171-173).
* buy-side ``provisionsfrei`` is always 0: ``'provisionsfrei' in prov``
  tests membership in a selector LIST, never True (immonet.py:238-242).
"""

from __future__ import annotations

import re

from ...functions import cleaners as C
from ...functions.xpathlite import XDoc
from .base import Link, ParseResult, SeedCtx, join_url

NAME = "immonet"
NETLOC = "www.immonet.de"
ANBIETER = "4"

_INT_RE = re.compile(r"\d+")


def _paged_url(x: XDoc, url: str, ctx: SeedCtx) -> str:
    # immonet.py:306-326 (getPagedUrl) — hour-of-day start page (P9)
    page_counter = x.xpath(
        "//div[contains(@class, 'pagination-wrapper')]/ul/li[last()]/a/text()"
    ).get()
    page_counter = int(page_counter)
    hour = ctx.hour
    if hour == 7:
        page_counter = 1
    elif hour == 10:
        page_counter = page_counter / 2
    elif hour == 13:
        page_counter = (page_counter / 2) + (page_counter * 0.2)
    elif hour == 16:
        page_counter = page_counter - (page_counter * 0.2)
    elif hour > 16:
        page_counter = page_counter - (page_counter * 0.1)
    page_counter = round(page_counter)
    return url + "&page=" + str(page_counter)


def _parse_listing(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # immonet.py:81-125
    res = ParseResult()
    text_mit_anzahl = x.xpath('//h1[@class="box-50"]/text()').getall()
    if not text_mit_anzahl:
        return res
    found_immos = int(re.findall(r"\d+", str(text_mit_anzahl))[0])
    immos = x.xpath("//a[contains(@id,'lnkToDetails_')]/@href").getall()
    viertel_list = x.xpath("//span[@class='text-100']/text()").getall()
    stadtid = meta.get("stadtid", ctx.stadtid)
    index = 0
    seq = 0
    broken = False  # once the in-loop exception fires, it fires every turn
    for href in immos:
        if broken:
            continue
        if index >= len(viertel_list):  # IndexError branch (immonet.py:107)
            broken = True
            continue
        orts_viertel = str(viertel_list[index]).split()[-1]
        if index >= found_immos:  # CloseSpider swallowed (immonet.py:109-111)
            broken = True
            continue
        index += 1
        durl = "https://www.immonet.de" + href
        res.links.append(
            Link(
                url=durl,
                kind="detail",
                seq=seq,
                meta={"stadtid": stadtid, "ortsviertel": orts_viertel},
            )
        )
        seq += 1
    next_page = x.xpath(
        "//a[contains(@class,'col-sm-3 col-xs-1 pull-right text-right')]/@href"
    ).getall()
    if next_page:
        res.links.append(
            Link(
                url=join_url(url, next_page[0]),
                kind="listing",
                seq=seq,
                meta={"stadtid": ctx.stadtid},
                dup_check=False,
            )
        )
    return res


def _parse_detail(x: XDoc, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    # immonet.py:127-299 (parse_item)
    item = {}
    loader = C.ItemLoader(item, x, C.immobilie_processors(ctx.run_date))
    if ctx.chatid is not None:
        item["chatid"] = ctx.chatid

    loader.add_xpath("title", "//h1[@id='expose-headline']/text()")
    typ = x.xpath("//h2[@id='sub-headline-expose']/text()").get()
    loader.add_value("typ", str(typ).split(" ")[0])
    loader.add_xpath("bezugsfreiab", "//div[@id='deliveryValue']/text()")
    loader.add_xpath("haustier", "//span[contains(text(),'Haustiere')]/text()")
    garage = x.xpath("//span[contains(text(),'Garage')]/text()").getall()
    tgarage = x.xpath("//span[contains(text(),'Tiefgarage')]/text()").getall()
    stellplatz = x.xpath("//span[contains(text(),'Stellplatz')]/text()").getall()
    if garage or tgarage or stellplatz:
        loader.add_xpath("garage", "1")  # numeric-literal xpath → '1.0'
    loader.add_value("url", url)

    images = []
    for i in range(1, 8):  # immonet.py:154-162, break on first miss
        bild = x.xpath(f'//div[@class="fotorama "]/div[{i}]/@data-full').get()
        if not bild:
            break
        images.append(bild)
    item["images"] = images

    loader.add_xpath("zimmer", "//div[@id='equipmentid_1']/text()")
    flache = str(x.xpath("//div[@id='areaid_1']/text()").get()).strip().split(".")[0]
    loader.add_value("flache", flache)

    if ctx.kaufen == 0:
        loader.add_value("kaufen", "0")
        # prices set DIRECTLY on the item, bypassing processors
        # (immonet.py:178-216); en→de decimal fallback = C15
        kaltm = x.xpath("//div[@id='priceid_2']/text()").get()
        if kaltm:
            m = C._WGNUM_RE.search(str(kaltm))
            if not m:
                # both en and de branches re-run the regex (immonet.py:180,
                # 187); a second no-match escapes to the outer try → drop
                return ParseResult()
            item["kaltmiete"] = C.parse_price_en_de(kaltm)
        nebenk = x.xpath("//div[@id='priceid_20']/text()").get()
        if nebenk:
            # the de-fallback parses the RAW string, not the regex token
            # (immonet.py:198-201); its failure escapes → item dropped
            m = C._WGNUM_RE.search(str(nebenk))
            try:
                if m:
                    item["nebenkosten"] = int(
                        round(C.parse_decimal(m.group(0), locale="en"))
                    )
                else:
                    raise C.NumberFormatError(str(nebenk))
            except Exception:
                try:
                    item["nebenkosten"] = int(
                        round(C.parse_decimal(str(nebenk), locale="de"))
                    )
                except Exception:
                    return ParseResult()
        gesamtk = x.xpath("//div[@id='priceid_4']/text()").get()
        if not gesamtk:
            if "kaltmiete" in item:
                gesamtk = item["kaltmiete"]
            else:
                return ParseResult()  # immonet.py:209-210 — item dropped
        try:
            tok = C._WGNUM_RE.search(str(gesamtk)).group(0)
            item["gesamtkosten"] = int(round(C.parse_decimal(tok, locale="en")))
        except Exception:
            try:
                item["gesamtkosten"] = int(
                    round(C.parse_decimal(str(gesamtk), locale="de"))
                )
            except Exception:
                return ParseResult()  # outer try/except drops item
    else:
        loader.add_value("kaufen", "1")
        # immonet.py:222-236
        raw = x.xpath("//div[@id='priceid_1']/text()").get()
        try:
            gesamtk = raw.strip().replace("€", "")  # raises if raw is None
            if not gesamtk:
                item["gesamtkosten"] = "auf Anfrage"
            else:
                item["gesamtkosten"] = int(
                    round(C.parse_decimal(str(gesamtk), locale="en"))
                )
        except Exception:
            if not raw:
                return ParseResult()
            try:
                tok = C._WGNUM_RE.search(str(raw)).group(0)
                item["gesamtkosten"] = int(round(C.parse_decimal(tok, locale="de")))
            except Exception:
                return ParseResult()
        # 'provisionsfrei' in SelectorList — always False (immonet.py:238-242)
        loader.add_value("provisionsfrei", 0)

    if ctx.haus == 1:
        loader.add_value("haus", "1")
        loader.add_xpath("grundstuck", "//div[@id='areaid_3']/text()")
    else:
        loader.add_value("haus", "0")

    loader.add_xpath("terrasse", "//span[contains(text(),'Terrasse')]/text()")
    loader.add_xpath("balkon", "//span[contains(text(),'Balkon')]/text()")
    loader.add_xpath("keller", "//span[contains(text(),'Keller')]/text()")
    loader.add_xpath("garten", "//span[contains(text(),'Garten')]/text()")
    ebk = x.xpath("//span[contains(text(),'EBK')]/text()").getall()
    if ebk:
        loader.add_value("ebk", "1")
    add = x.xpath("normalize-space(//p[@class='text-100 pull-left']/text())").get()
    orts_viertel = meta.get("ortsviertel", "")
    if add:
        new_add = str(add) + ", " + str(orts_viertel)
        loader.add_value("adresse", new_add.encode("utf-8"))
    else:
        add = (add or "") + "," + str(orts_viertel)
        loader.add_value("adresse", str(add).encode("utf-8"))

    loader.add_xpath("aufzug", "//span[contains(text(),'Personenaufzug')]/text()")
    loader.add_xpath("barriefrei", "//span[contains(text(),'Barrierefrei')]/text()")
    loader.add_xpath("mobliert", "//span[contains(text(),'Möbliert/Teilmöbliert')]/text()")

    stadtid = meta.get("stadtid", ctx.stadtid)
    if orts_viertel and str(orts_viertel).isalpha():
        # J2 lookup via ExtractViertel.extractAdresse (immonet.py:286-293)
        stadtvid = ctx.viertel_index(str(orts_viertel))
        if stadtvid and stadtvid != 0:
            loader.add_value("stadtvid", stadtvid)
    else:
        loader.add_value("stadtvid", 0)  # self.stadtvid initialised to 0

    loader.add_value("stadtid", stadtid)
    loader.add_value("anbieter", ANBIETER)
    loader.add_value("stadtname", ctx.stadtname)

    return ParseResult(item=loader.load_item(), item_kind="immo")


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    from ...functions.xpathlite import doc

    if kind == "start":
        x = doc(body)
        paged = _paged_url(x, url, ctx)
        return ParseResult(
            links=[Link(url=paged, kind="listing", seq=0,
                        meta={"stadtid": ctx.stadtid}, dup_check=False)]
        )
    if kind == "listing":
        return _parse_listing(doc(body), url, meta, ctx)
    if kind == "detail":
        return _parse_detail(doc(body), url, meta, ctx)
    raise ValueError(f"immonet: unknown page kind {kind!r}")
