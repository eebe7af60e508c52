"""sparkasse portal parser — reference ``demo_crawl/spiders/sparkasse.py``.

JSON-only: one API page, items inline (no detail hop, no pagination, no
dup check at all — sparkasse.py:58-169).

Quirks preserved:
* mieten seeds never fetch anything (``if kaufen == 0: return`` in
  start_requests, sparkasse.py:51-52) — the fixture generator therefore
  emits sparkasse seeds only for kaufen=1.
* kaufpreis '.'-split: "450.000" → "450" (sparkasse.py:70-73).
* estates with ≥2 images add undeclared 'bildN' loader fields →
  ``load_item`` KeyErrors; the first such estate aborts the whole page
  after its inner-try yield attempt fails, dropping all later estates
  (sparkasse.py:145-169).
* estates with <2 images are yielded TWICE (double ``yield load_item()``
  at sparkasse.py:164 and 169).
* 'gartennutzung'/'EBK' presence is checked at the TOP level but the value
  is read from nested dicts (sparkasse.py:129-137).
"""

from __future__ import annotations

import json

from ...functions import cleaners as C
from .base import ParseResult, SeedCtx

NAME = "sparkasse"
NETLOC = "immobilien.sparkasse.de"
ANBIETER = "3"


def _parse_api(body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    res = ParseResult()
    data = json.loads(body)
    for jsonitem in data["_embedded"]["estate"]:
        item = {}
        loader = C.ItemLoader(item, None, C.immobilie_processors(ctx.run_date))
        if ctx.chatid is not None:
            item["chatid"] = ctx.chatid

        loader.add_value("title", jsonitem["freitexte"]["objekttitel"])
        if "." in jsonitem["preise"]["kaufpreis"]:
            kaufpreis = jsonitem["preise"]["kaufpreis"].split(".")[0]
        else:
            kaufpreis = jsonitem["preise"]["kaufpreis"]
        loader.add_value("gesamtkosten", kaufpreis)
        loader.add_value("flache", jsonitem["flaechen"]["wohnflaeche"])

        if "anzahl_zimmer" in jsonitem["flaechen"]:
            loader.add_value("zimmer", jsonitem["flaechen"]["anzahl_zimmer"].split(".")[0])

        if "aussen_courtage" in jsonitem["preise"]:
            if jsonitem["preise"]["aussen_courtage"] == "prov.frei":
                loader.add_value("provisionsfrei", "1")
            else:
                loader.add_value("provisionsfrei", "0")

        if "anzahl_terrassen" in jsonitem:
            loader.add_value("terrasse", "1")
        if "unterkellert" in jsonitem["ausstattung"]:
            loader.add_value("keller", "1")
        if "grundstuecksflaeche" in jsonitem["flaechen"]:
            loader.add_value("grundstuck", jsonitem["flaechen"]["grundstuecksflaeche"])
        if "geo" in jsonitem:
            item["adresse"] = jsonitem["geo"]["ort"]
            if "strasse" in jsonitem["geo"]:
                item["adresse"] = item["adresse"] + ", " + jsonitem["geo"]["strasse"]
        else:
            item["adresse"] = ""

        durl = "https://immobilien.sparkasse.de/" + jsonitem["id"]

        if "display_data" in jsonitem["sip"]:
            specials = jsonitem["sip"]["display_data"]["specials"]
            if "Garten" in specials:
                loader.add_value("garten", "1")
            if "Balkon" in specials:
                loader.add_value("balkon", "1")
            if "Personenaufzug" in specials:
                loader.add_value("aufzug", "1")
            if "Stellplatz" in specials or "Garage" in specials:
                loader.add_value("garage", "1")
            if "Terrasse" in specials:
                loader.add_value("terrasse", "1")

        if "EBK" in jsonitem:
            if jsonitem["kueche"]["attributes"]["EBK"] == "true":
                loader.add_value("ebk", "1")
        if "gartennutzung" in jsonitem:
            if jsonitem["ausstattung"]["gartennutzung"] == "true":
                loader.add_value("garten", "1")

        loader.add_value("url", durl)
        loader.add_value("stadtid", ctx.stadtid)
        loader.add_value("anbieter", ANBIETER)
        loader.add_value("kaufen", ctx.kaufen)
        loader.add_value("haus", ctx.haus)

        # 'bildN' are not declared item fields (sparkasse.py:145-151) —
        # their presence makes BOTH load_item calls raise KeyError
        for i in range(1, 8):
            try:
                value = jsonitem["sip"]["images"][i]["formats"]["m"]
                loader.add_value(f"bild{i}", value)
            except Exception:
                pass  # IndexError for short image lists (sparkasse.py:150)

        images = []
        for img in jsonitem["sip"]["images"]:
            try:
                if not img:
                    break
                images.append(img["formats"]["original"])
            except Exception:
                pass

        try:
            item["images"] = images
            res.items.append((dict(loader.load_item()), "immo"))
        except Exception:
            pass  # sparkasse.py:166-167
        # second, unguarded yield (sparkasse.py:169): KeyError aborts the
        # whole page here, keeping items already yielded
        try:
            res.items.append((dict(loader.load_item()), "immo"))
        except Exception:
            break
    return res


def parse(kind: str, body: str, url: str, meta: dict, ctx: SeedCtx) -> ParseResult:
    if kind in ("start", "listing"):
        return _parse_api(body, url, meta, ctx)
    raise ValueError(f"sparkasse: unknown page kind {kind!r}")
