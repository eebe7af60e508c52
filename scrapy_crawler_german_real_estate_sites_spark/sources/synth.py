"""Deterministic synthetic fixture generator — the "web" as a
Common-Crawl-style pages table (BASELINE.json:input_hint shape:
``url, warc_ts, html:binary, text, lang``), plus the ``seeds`` /
``stadte`` / ``robots`` / ``geocache`` dimension tables (FIXTURES.md §1–§5).

Pages embed exactly the DOM shapes the reference spiders select on
(SURVEY.md §2.5) — e.g. immonet's ``h1.box-50`` result count
(``immonet.py:91-97``), ``lnkToDetails_`` anchors (``immonet.py:99-100``),
``priceid_*`` divs with mixed German/English number formats to exercise the
en→de fallback (``immonet.py:175-236``), plus edge rows: "auf Anfrage"
prices, digit-less dates, NEIN pets, short viertel lists, repeated detail
URLs, and query-string variants (D1).

Everything is seeded (seed=42) and offline — no external data.  Generation
writes plain parquet via pyarrow; tiers are cached on disk keyed by a
manifest of the generator parameters.
"""

from __future__ import annotations

import datetime
import json
import os
import random
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = datetime.datetime(2021, 5, 1, 6, 0, 0)

# tier → number of cities (3 seed combos each: (haus,kaufen) ∈
# {(0,0),(0,1),(1,1)} — mirrors database.py:114-120 returnChangedKritids)
TIERS = {
    "tiny": {"cities": 2},
    "sf0.001": {"cities": 15},
    "sf0.01": {"cities": 150},
    "sf0.1": {"cities": 1500},
    # scaling-evidence tiers: big enough that the flat per-wave maintenance
    # terms stop dominating the 8->32 comparison (BENCH/BASELINE.md);
    # sf0.6 extends the Amdahl-trend measurement one more doubling
    "sf0.3": {"cities": 4500},
    "sf0.6": {"cities": 9000},
    # sf1.2 doubles sf0.6 once more: the point where the flat per-wave
    # maintenance terms are predicted to fall under ~12% of the 32-leg
    # wall and 8->32 efficiency should approach the parse-kernel ceiling
    "sf1.2": {"cities": 18000},
}

COMBOS = [(0, 0), (0, 1), (1, 1)]

_CITY_BASE = [
    "Amberg", "Regensburg", "Nuernberg", "Bamberg", "Wuerzburg", "Erlangen",
    "Augsburg", "Ingolstadt", "Landshut", "Passau", "Rosenheim", "Kempten",
    "Bayreuth", "Coburg", "Hof", "Schweinfurt", "Aschaffenburg", "Fuerth",
    "Ansbach", "Weiden", "Straubing", "Memmingen", "Kaufbeuren", "Schwabach",
]

_VIERTEL_POOL = [
    "Mitte", "Altstadt", "Nord", "Sued", "West", "Ost", "Gartenstadt",
    "Neustadt", "Hafen", "Lindenhof", "Rosenberg", "Weinberg", "Bergfeld",
    "Talblick", "Amselgrund", "Buchenau", "Eichenhain", "Falkenberg",
]

_STREETS = [
    "Hauptstraße", "Bahnhofstraße", "Gartenweg", "Lindenallee", "Ringstraße",
    "Schulstraße", "Marktplatz", "Amselweg", "Buchenweg", "Eichenstraße",
]

_TITLE_ADJ = ["Schöne", "Helle", "Moderne", "Gemütliche", "Großzügige", "Renovierte"]

_RENT_PRICES = [
    "450 €", "520 €", "1.234,56 €", "1,500 €", "780€", "999 €", "1.100 €",
    "635,50 €", "2.000,00 €", "845 €",
]
_NEBENK = ["120 €", "95 €", "210,50 €", "80€", "150 €"]
_BUY_PRICES = ["450.000 €", "299000 €", "1.250.000 €", "385.000,00 €", "520.000 €"]
_DATES = ["ab 01.03.21", "01.07.2021", "sofort", "nach Vereinbarung", "15.08.21"]

_FEATURES = [
    ("Terrasse vorhanden", "terrasse"),
    ("Balkon", "balkon"),
    ("Keller", "keller"),
    ("Garten", "garten"),
    ("EBK", "ebk"),
    ("Personenaufzug", "aufzug"),
    ("Barrierefrei", "barriefrei"),
    ("Möbliert/Teilmöbliert", "mobliert"),
    ("Garage", "garage"),
    ("Tiefgarage", "garage"),
    ("Stellplatz", "garage"),
]

GONE_MARKERS = [
    "Angebot wurde deaktiviert",
    "Objekt nicht mehr verfügbar.",
]


class PageSink:
    def __init__(self):
        self.urls = []
        self.ts = []
        self.html = []
        self.text = []
        self.lang = []
        self._seen = set()
        self._n = 0

    def add(self, url, body, lang="de", ts_offset=None):
        if url in self._seen:
            return
        self._seen.add(url)
        self._n += 1
        off = ts_offset if ts_offset is not None else self._n
        self.urls.append(url)
        self.ts.append(BASE_TS + datetime.timedelta(seconds=off))
        self.html.append(body.encode("utf-8"))
        self.text.append(body)
        self.lang.append(lang)

    def table(self):
        return pa.table(
            {
                "url": pa.array(self.urls, pa.string()),
                "warc_ts": pa.array(self.ts, pa.timestamp("us")),
                "html": pa.array(self.html, pa.binary()),
                "text": pa.array(self.text, pa.string()),
                "lang": pa.array(self.lang, pa.string()),
            }
        )


# ---------------------------------------------------------------------------
# immonet page grammar (reference selectors: immonet.py:91-125,127-299)
# ---------------------------------------------------------------------------

def _immonet_seed_url(stadtid, haus, kaufen):
    sucht = "kaufen" if kaufen else "mieten"
    obj = "haus" if haus == 1 else "wohnung"
    return (
        "https://www.immonet.de/immobiliensuche/sel.do"
        f"?city={stadtid}&suchart={sucht}&objecttype={obj}"
    )


def _immonet_listing_body(rng, city, page, last_page, entries, found_immos, next_href):
    vier_spans = "\n".join(
        f'<span class="text-100">{city["stadt"]} {v}</span>'
        for _, v in entries
        if v is not None
    )
    anchors = "\n".join(
        f'<a id="lnkToDetails_{i}" href="{href}">Details</a>'
        for i, (href, _v) in enumerate(entries, 1)
    )
    pag_items = "".join(f"<li><a>{p}</a></li>" for p in range(1, last_page + 1))
    nxt = (
        f'<a class="col-sm-3 col-xs-1 pull-right text-right" href="{next_href}">weiter</a>'
        if next_href
        else ""
    )
    return f"""<html><head><title>Immobilien {city['stadt']}</title></head><body>
<h1 class="box-50"> {found_immos} Immobilien in {city['stadt']} - Seite {page} </h1>
{anchors}
{vier_spans}
{nxt}
<div class="pagination-wrapper"><ul>{pag_items}</ul></div>
</body></html>"""


def _immonet_detail_body(rng, city, viertel, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    rooms = rng.choice(["2", "3", "4", "2,5", "3,5"])
    title = f"{adj} {rooms}-Zimmer-{'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    if rng.random() < 0.05:
        title = "[TOP] " + title  # exercises remove_dot (items.py:30-31)
    typ_line = f"{'Haus' if haus else 'Wohnung'} zur {'Kauf' if kaufen else 'Miete'}"
    parts = [f'<h1 id="expose-headline">{title}</h1>']
    if rng.random() < 0.9:
        parts.append(f'<h2 id="sub-headline-expose">{typ_line}</h2>')
    if rng.random() < 0.7:
        parts.append(f'<div id="deliveryValue">{rng.choice(_DATES)}</div>')
    if rng.random() < 0.85:
        parts.append(f'<div id="equipmentid_1">{rooms} Zimmer</div>')
    if rng.random() < 0.85:
        area = rng.choice(["75", "60.5", "102", "48", "88.0", "120"])
        parts.append(f'<div id="areaid_1">{area}</div>')
    if kaufen:
        r = rng.random()
        if r < 0.75:
            parts.append(f'<div id="priceid_1">{rng.choice(_BUY_PRICES)}</div>')
        elif r < 0.85:
            parts.append('<div id="priceid_1">   </div>')  # → 'auf Anfrage'
        # else: missing → item dropped (immonet.py:230-233)
        if rng.random() < 0.5:
            parts.append('<div id="courtageValue">provisionsfrei</div>')
    else:
        r = rng.random()
        if r < 0.8:
            parts.append(f'<div id="priceid_2">{rng.choice(_RENT_PRICES)}</div>')
        if rng.random() < 0.6:
            parts.append(f'<div id="priceid_20">{rng.choice(_NEBENK)}</div>')
        if rng.random() < 0.5:
            parts.append(f'<div id="priceid_4">{rng.choice(_RENT_PRICES)}</div>')
    if haus and rng.random() < 0.8:
        parts.append(f'<div id="areaid_3">{rng.choice(["250", "410", "620.5"])}</div>')
    n_img = rng.randint(0, 7)
    if n_img:
        imgs = "".join(
            f'<div data-full="https://i.immonet.de/{rng.randrange(10**9)}.jpg"></div>'
            for _ in range(n_img)
        )
        parts.append(f'<div class="fotorama ">{imgs}</div>')
    feats = rng.sample(_FEATURES, rng.randint(0, 6))
    for label, _f in feats:
        parts.append(f"<span>{label}</span>")
    if rng.random() < 0.3:
        parts.append(f"<span>Haustiere: {rng.choice(['NEIN', 'erlaubt', 'nein '])}</span>")
    if rng.random() < 0.9:
        street = f"{rng.choice(_STREETS)} {rng.randint(1, 180)}"
        parts.append(f'<p class="text-100 pull-left">{street}</p>')
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    body = "\n".join(parts)
    return f"<html><body>\n{body}\n</body></html>"


def _gen_immonet_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    seed_url = _immonet_seed_url(stadtid, haus, kaufen)
    last_page = rng.randint(3, 6)
    detail_ids = []

    def new_detail():
        # occasional cross-page repeat (dup-check exercise)
        if detail_ids and rng.random() < 0.08:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    pages_entries = {}
    for page in range(1, last_page + 1):
        n = rng.randint(8, 12)
        entries = []
        for _ in range(n):
            did = new_detail()
            href = f"/angebot/{did}"
            if rng.random() < 0.1:
                href += "?ref=list"  # query-variant (D1 stripping)
            viertel = rng.choice(city["stadtviertel"])
            if rng.random() < 0.05:
                viertel = viertel + " 2"  # non-alpha last token → stadtvid 0
            entries.append((href, viertel))
        # edge: short viertel list (IndexError branch, immonet.py:107)
        if rng.random() < 0.05 and n > 3:
            entries = [(h, v) for h, v in entries[:-2]] + [
                (entries[-2][0], None),
                (entries[-1][0], None),
            ]
        pages_entries[page] = entries

    # found_immos: usually generous; sometimes caps the page (F2)
    total = sum(len(e) for e in pages_entries.values())
    found_immos = total + rng.randint(0, 30)
    if rng.random() < 0.1:
        found_immos = max(2, len(pages_entries[1]) - 3)

    for page in range(1, last_page + 1):
        entries = pages_entries[page]
        next_href = None
        if page < last_page:
            nxt = _immonet_seed_url(stadtid, haus, kaufen) + f"&page={page + 1}"
            # reference uses urljoin on a relative href (immonet.py:124)
            next_href = nxt.replace("https://www.immonet.de", "")
        body = _immonet_listing_body(
            rng, city, page, last_page, entries, found_immos, next_href
        )
        sink.add(_immonet_seed_url(stadtid, haus, kaufen) + f"&page={page}", body)
        if page == 1:
            # the bare seed URL serves the same widgeted body (start page)
            sink.add(seed_url, body)
        for href, viertel in entries:
            durl = "https://www.immonet.de" + href
            gone = rng.random() < 0.02
            sink.add(
                durl,
                _immonet_detail_body(rng, city, viertel, haus, kaufen, gone=gone),
            )

    return {
        "seed_id": seed_id,
        "stadtid": stadtid,
        "stadtname": city["stadt"],
        "haus": haus,
        "kaufen": kaufen,
        "portal": "immonet",
        "url": seed_url,
        "chatid": None,
    }


# ---------------------------------------------------------------------------
# immoscout page grammar (immoscout.py:93-256; seeds enter at the listing
# callback — detectPageStart is dead code, immoscout.py:81-83)
# ---------------------------------------------------------------------------

def _immoscout_detail_body(rng, city, viertel, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    rooms = rng.choice(["2", "3", "4", "2,5"])
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    parts = [f'<h1 id="expose-title">{title}</h1>']
    # criteriagroup div(s): 0 (5% → item fails url+title gate), 1, or 2
    # (only the LAST one's dd values survive — loader-per-div quirk)
    n_groups = rng.choices([0, 1, 2], weights=[5, 80, 15])[0]
    canon = None
    for gi in range(n_groups):
        dds = []
        if rng.random() < 0.85:
            dds.append(f'<dd class="is24qa-typ grid-item three-fifths">{"Haus" if haus else "Etagenwohnung"}</dd>')
        if rng.random() < 0.6:
            dds.append(f'<dd class="is24qa-bezugsfrei-ab grid-item three-fifths">{rng.choice(_DATES)}</dd>')
        if rng.random() < 0.4:
            dds.append(f'<dd class="is24qa-haustiere grid-item three-fifths">{rng.choice(["Ja", "Nein", "Nach Vereinbarung"])}</dd>')
        if rng.random() < 0.4:
            dds.append('<dd class="is24qa-garage-stellplatz grid-item three-fifths">1 Stellplatz</dd>')
        parts.append(
            '<div class="criteriagroup criteria-group--two-columns">'
            + "".join(dds)
            + "</div>"
        )
    parts.append('<dd class="is24qa-zimmer grid-item three-fifths">%s</dd>' % rng.choice(["2", "3", "4", "2,5"]))
    if kaufen:
        if rng.random() < 0.9:
            parts.append(f'<div class="is24qa-kaufpreis is24-value font-semibold is24-preis-value">{rng.choice(_BUY_PRICES)}</div>')
        parts.append('<dd class="is24qa-wohnflaeche-ca grid-item three-fifths">%s m²</dd>' % rng.choice(["75", "102,5", "88"]))
        if rng.random() < 0.5:
            parts.append('<span class="is24qa-provisionsfrei-label">Provisionsfrei</span>')
        if haus and rng.random() < 0.8:
            parts.append('<dd class="is24qa-grundstueck-ca grid-item three-fifths">%s m²</dd>' % rng.choice(["250", "410"]))
    else:
        if rng.random() < 0.9:
            parts.append(f'<div class="is24qa-kaltmiete is24-value font-semibold">{rng.choice(_RENT_PRICES)}</div>')
        parts.append('<div class="is24qa-flaeche is24-value font-semibold">%s m²</div>' % rng.choice(["60,5", "75", "48"]))
        if rng.random() < 0.6:
            parts.append(f'<dd class="is24qa-nebenkosten grid-item three-fifths">+<span>NK</span>{rng.choice(_NEBENK)}</dd>')
        if rng.random() < 0.5:
            parts.append(f'<dd class="is24qa-gesamtmiete grid-item three-fifths font-bold">{rng.choice(_RENT_PRICES)}</dd>')
    n_img = rng.randint(0, 7)
    for _ in range(n_img):
        parts.append(f'<img class="sp-image " data-src="https://pic.is24.de/{rng.randrange(10**9)}.jpg"/>')
    feats = []
    if rng.random() < 0.5:
        feats.append('<span class="is24qa-balkon-terrasse-label">Balkon/ Terrasse</span>')
    if rng.random() < 0.4:
        feats.append('<span class="is24qa-keller-label">Keller</span>')
    if rng.random() < 0.3:
        feats.append('<span class="is24qa-garten-mitbenutzung-label">Garten/ -mitbenutzung</span>')
    if rng.random() < 0.3:
        feats.append('<span class="is24qa-personenaufzug-label">Personenaufzug</span>')
    if rng.random() < 0.2:
        feats.append('<span class="is24qa-stufenloser-zugang-label">Stufenloser Zugang</span>')
    if feats:
        parts.append('<div class="criteriagroup boolean-listing padding-top-l">' + "".join(feats) + "</div>")
    if rng.random() < 0.3:
        parts.append('<span class="is24qa-einbaukueche-label">Einbauküche</span>')
    if rng.random() < 0.85:
        street = f"{rng.choice(_STREETS)} {rng.randint(1, 180)}"
        parts.append(f'<span class="block font-nowrap print-hide">{street}, {city["stadt"]}</span>')
    parts.append(f'<a href="/umkreis">{viertel}</a><ul class="breadcrumb__item--current"><li>x</li></ul>')
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>", canon


def _gen_immoscout_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    obj = "haus" if haus == 1 else "wohnung"
    sucht = "kaufen" if kaufen else "mieten"
    base = f"https://www.immobilienscout24.de/Suche/de/stadt{stadtid}/{obj}-{sucht}"
    seed_url = base + "?pagenumber=1"
    last_page = rng.randint(2, 5)
    detail_ids = []

    def new_detail():
        if detail_ids and rng.random() < 0.06:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(6, 10)
        anchors = []
        for _ in range(n):
            if rng.random() < 0.05:
                # absolute link → skipped by the spider (immoscout.py:107)
                anchors.append(
                    '<a class="result-list-entry__brand-title-container x" '
                    'href="https://partner.example.de/x">partner</a>'
                )
                continue
            did = new_detail()
            href = f"/expose/{did}"
            anchors.append(
                f'<a class="result-list-entry__brand-title-container x" href="{href}">exposé</a>'
            )
            durl = "https://www.immobilienscout24.de" + href
            viertel = rng.choice(city["stadtviertel"])
            body, _ = _immoscout_detail_body(
                rng, city, viertel, haus, kaufen, gone=rng.random() < 0.02
            )
            # canonical link == detail url (the item's url field)
            body = body.replace(
                "<html><body>",
                f'<html><head><link rel="canonical" href="{durl}"/></head><body>',
            )
            sink.add(durl, body)
        nxt = (
            f'<a data-is24-qa="paging_bottom_next" href="?pagenumber={page + 1}">weiter</a>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>Immobilien in {city['stadt']} - Seite {page}</h1>
{"".join(anchors)}
{nxt}
</body></html>"""
        sink.add(base + f"?pagenumber={page}", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "immoscout",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# ebay-kleinanzeigen page grammar (ebay-klein.py:63-157)
# ---------------------------------------------------------------------------

def _ebay_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    parts = [f'<h1 id="viewad-title">{title}</h1>']
    r = rng.random()
    if r < 0.8:
        price = rng.choice(["450 €", "1.200 €", "650€", "299.000 €", "780 € VB"])
    elif r < 0.9:
        price = "VB"  # no digits → item dropped (ebay-klein.py:111-113)
    else:
        price = "Auf Anfrage"
    parts.append(f'<h2 id="viewad-price">{price}</h2>')
    dets = []
    if rng.random() < 0.85:
        dets.append(f"<li>Wohnfläche <span>{rng.choice(['75 m²', '1.050 m²', '48 m²'])}</span></li>")
    if rng.random() < 0.85:
        dets.append(f"<li>Zimmer <span>{rng.choice(['2', '3', '4,5'])}</span></li>")
    if haus and rng.random() < 0.7:
        dets.append(f"<li>Grundstücksfläche <span>{rng.choice(['250 m²', '410 m²'])}</span></li>")
    if dets:
        parts.append('<ul class="addetailslist">' + "".join(dets) + "</ul>")
    if rng.random() < 0.9:
        parts.append(f'<span id="viewad-locality">{rng.randint(10000, 99999)} {city["stadt"]}</span>')
    for _ in range(rng.randint(0, 5)):
        parts.append(f'<div class="galleryimage-element x"><img src="https://img.ebay-kl.de/{rng.randrange(10**9)}.jpg"/></div>')
    tags = rng.sample(
        ["Keller", "Garage", "Haustiere erlaubt", "Stufenloser Zugang",
         "Möbliert", "Einbauküche", "Balkon", "Terrasse"],
        rng.randint(0, 4),
    )
    if tags:
        parts.append('<ul class="checktaglist">' + "".join(f"<li>{t}</li>" for t in tags) + "</ul>")
    if kaufen and rng.random() < 0.4:
        parts.append("<p>Keine zusätzliche Käuferprovision</p>")
    if gone:
        parts.append("<p>Objekt nicht mehr verfügbar.</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_ebay_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    seed_url = (
        f"https://www.ebay-kleinanzeigen.de/s-{'haus' if haus else 'wohnung'}-{sucht}/stadt{stadtid}/k0"
    )
    last_page = rng.randint(2, 4)
    detail_ids = []

    def new_detail():
        if detail_ids and rng.random() < 0.06:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(6, 10)
        anchors = []
        for _ in range(n):
            did = new_detail()
            href = f"/s-anzeige/{did}"
            anchors.append(f'<a class="ellipsis" href="{href}">anzeige</a>')
            durl = "https://www.ebay-kleinanzeigen.de" + href
            sink.add(durl, _ebay_detail_body(rng, city, haus, kaufen,
                                             gone=rng.random() < 0.02))
        # pagination href concatenates onto the SEED url (ebay-klein.py:81)
        nxt = (
            f'<a class="pagination-next" href="?p={page + 1}">weiter</a>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>Anzeigen {city['stadt']} Seite {page}</h1>
{"".join(anchors)}
{nxt}
</body></html>"""
        sink.add(seed_url if page == 1 else seed_url + f"?p={page}", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "ebay",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# kalay page grammar (kalay.py:63-173)
# ---------------------------------------------------------------------------

def _kalay_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    parts = [f'<h1 id="exposeHeadline">{title}</h1>']
    rows = []
    if kaufen:
        if rng.random() < 0.85:
            rows.append(f"<tr><td>Kaufpreis</td><td><span>{rng.choice(_BUY_PRICES)}</span></td></tr>")
        if rng.random() < 0.4:
            parts.append("<p>Provisionsfrei zu verkaufen</p>")
    else:
        if rng.random() < 0.85:
            rows.append(f"<tr><td>Warmmiete</td><td><span>{rng.choice(_RENT_PRICES)}</span></td></tr>")
    if rows:
        parts.append("<table>" + "".join(rows) + "</table>")
    gi = []
    if rng.random() < 0.9:  # missing Wohnfläche → item dropped (quirk)
        gi.append(f"<p><span>{rng.choice(['75,5', '60', '102'])}</span><b>Wohnfläche</b></p>")
    if rng.random() < 0.85:
        gi.append(f"<p><span>{rng.choice(['2', '3', '4'])}</span><b>Zimmer</b></p>")
    if gi:
        parts.append('<div class="general-info">' + "".join(gi) + "</div>")
    if rng.random() < 0.85:
        street = f"{rng.choice(_STREETS)} {rng.randint(1, 180)}"
        parts.append(
            '<table class="ad-info estate estate-content">'
            f'<tr><td class="label">Ort</td><td><span>{rng.randint(10000, 99999)} {city["stadt"]}</span></td></tr>'
            f'<tr><td class="label">Straße</td><td><span>{street}</span></td></tr>'
            "</table>"
        )
    feats = rng.sample(
        ["Keller", "Garage", "Haustier erlaubt", "barrierefrei", "Möbliert",
         "Einbauküche", "Balkon", "Terrasse", "Garten"],
        rng.randint(0, 4),
    )
    if feats:
        parts.append(
            '<table class="ad-info estate  estate-content extra">'
            + "".join(f"<tr><td>{f}</td></tr>" for f in feats)
            + "</table>"
        )
    for _ in range(rng.randint(0, 4)):
        parts.append(
            f'<img class="gallery-cell img" data-flickity-lazyload="https://img.kalaydo.de/{rng.randrange(10**9)}.jpg"/>'
        )
    if gone:
        parts.append("<p>Objekt nicht mehr verfügbar.</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_kalay_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    base = f"https://www.kalaydo.de/immobilien/{'haus' if haus else 'wohnung'}-{sucht}/stadt{stadtid}"
    seed_url = base + "/seite-1"
    last_page = rng.randint(2, 4)
    detail_ids = []

    def new_detail():
        if detail_ids and rng.random() < 0.06:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(6, 10)
        anchors = []
        for _ in range(n):
            did = new_detail()
            durl = f"https://www.kalaydo.de/immobilien/anzeige/{did}"
            anchors.append(
                f'<div class="clear-row content-container"><a href="{durl}">anzeige</a></div>'
            )
            sink.add(durl, _kalay_detail_body(rng, city, haus, kaufen,
                                              gone=rng.random() < 0.02))
        nxt = (
            f'<a rel="next" href="{base}/seite-{page + 1}">weiter</a>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>Kalaydo {city['stadt']} Seite {page}</h1>
{"".join(anchors)}
{nxt}
</body></html>"""
        sink.add(base + f"/seite-{page}", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "kalay",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# berlin.de page grammar (berlin.py:61-183)
# ---------------------------------------------------------------------------

def _berlin_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    parts = [f'<h1 class="heading--article">{title}</h1>', '<div id="expose">']

    def fact(label, value):
        return (
            f'<li><span class="label">{label}</span>'
            f'<span class="text">{value}</span></li>'
        )

    facts = []
    if kaufen:
        # two Kaufpreis texts — the spider reads the SECOND (berlin.py:110);
        # buy items are dropped anyway by the malformed Courtage xpath
        facts.append(fact("Kaufpreis-Info", "siehe unten"))
        facts.append(fact("Kaufpreis", rng.choice(_BUY_PRICES)))
    else:
        r = rng.random()
        if r < 0.6:
            facts.append(fact("Warm-Miete", rng.choice(_RENT_PRICES)))
        elif r < 0.9:
            facts.append(fact("Netto-Kaltmiete", rng.choice(_RENT_PRICES)))
    if rng.random() < 0.9:
        facts.append(fact("Wohnfläche", rng.choice(["75,5 m²", "60 m²", "102 m²"])))
    if rng.random() < 0.85:
        facts.append(fact("Zimmer", rng.choice(["2", "3", "4"])))
    if haus and rng.random() < 0.7:
        facts.append(fact("Gesamtfläche", rng.choice(["250 m²", "410 m²"])))
    parts.append("<ul>" + "".join(facts) + "</ul>")
    feats = rng.sample(
        ["Keller", "Garage", "Haustiere willkommen", "barrierefrei", "Möbliert",
         "Einbauküche", "Balkon", "Terrasse", "Garten"],
        rng.randint(0, 4),
    )
    for f in feats:
        parts.append(f"<p>{f}</p>")
    parts.append("</div>")
    if rng.random() < 0.85:
        parts.append(f'<span class="street-address">{rng.choice(_STREETS)} {rng.randint(1, 180)}</span>')
    if rng.random() < 0.8:
        parts.append(f'<span class="postal-code">{rng.randint(10000, 14999)}</span>')
    if rng.random() < 0.8:
        parts.append(f'<span class="locality">{rng.choice(city["stadtviertel"])}</span>')
    for _ in range(rng.randint(0, 4)):
        parts.append(
            f'<img data-src="https://pic.immobilienscout24.de/b/{rng.randrange(10**9)}.jpg"/>'
        )
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_berlin_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    base = f"/immobilien/{'haus' if haus else 'wohnung'}-{sucht}/stadt{stadtid}"
    seed_url = "https://www.berlin.de" + base + "?page=1"
    last_page = rng.randint(2, 4)
    detail_ids = []

    def new_detail():
        if detail_ids and rng.random() < 0.06:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(6, 10)
        arts = []
        for _ in range(n):
            did = new_detail()
            href = f"/immobilien/expose/{did}"
            arts.append(f'<article><h3><a href="{href}">anzeige</a></h3></article>')
            sink.add(
                "https://www.berlin.de" + href,
                _berlin_detail_body(rng, city, haus, kaufen, gone=rng.random() < 0.02),
            )
        nxt = (
            f'<a rel="next" href="{base}?page={page + 1}">oben</a>'
            f'<a rel="next" href="{base}?page={page + 1}">unten</a>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>Wohnungen {city['stadt']} Seite {page}</h1>
{"".join(arts)}
{nxt}
</body></html>"""
        sink.add("https://www.berlin.de" + base + f"?page={page}", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "berlin",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# wohnungsmarkt24 page grammar (wohnungsmarkt24.py:73-176)
# ---------------------------------------------------------------------------

def _wm24_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} zum Angebot"
    parts = [f'<h1 class="headline-expose">{title}</h1>']
    if rng.random() < 0.9:
        # adresse h2: split('-')[1]; 8% without '-' → item dropped (quirk)
        if rng.random() < 0.92:
            parts.append(
                f'<h2 title="Daten">Objekt - {city["stadt"]} {rng.choice(city["stadtviertel"])}</h2>'
            )
        else:
            parts.append(f'<h2 title="Daten">Objekt {city["stadt"]}</h2>')
    if rng.random() < 0.8:
        parts.append(
            '<div class="row margin-bottom-10"><div>a</div><div>b</div>'
            f'<div><strong>{rng.choice(["2", "3", "4"])} Zi.</strong></div></div>'
        )
    # odd/even fact table: odd[1]=kosten, odd[3]=flaeche, even[3]=grundstueck
    rows = []
    kost = rng.choice(_RENT_PRICES if not kaufen else _BUY_PRICES)
    rows.append(f'<tr class="odd"><td class="label">Preis</td><td class="value">{kost}</td></tr>')
    rows.append('<tr class="even"><td class="label">Etage</td><td class="value">2</td></tr>')
    rows.append(f'<tr class="odd"><td class="label">Baujahr</td><td class="value">{rng.randint(1950, 2020)}</td></tr>')
    rows.append('<tr class="even"><td class="label">Heizung</td><td class="value">Zentral</td></tr>')
    if rng.random() < 0.9:
        rows.append(f'<tr class="odd"><td class="label">Fläche</td><td class="value">{rng.choice(["75,5", "60", "102"])} m²</td></tr>')
    if rng.random() < 0.8:
        rows.append(f'<tr class="even"><td class="label">Grund</td><td class="value">{rng.choice(["250", "410"])} m²</td></tr>')
    parts.append("<table>" + "".join(rows) + "</table>")
    if kaufen and rng.random() < 0.4:
        parts.append("<p>Dieses Objekt ist provisionsfrei</p>")
    feats = rng.sample(
        ["Keller vorhanden", "Balkon", "Garage", "Haustiere erlaubt",
         "Stufenloser Zugang", "Möbliert", "Terrassen"],
        rng.randint(0, 3),
    )
    for f in feats:
        parts.append(f"<p>{f}</p>")
    if rng.random() < 0.6:
        imgs = "".join(
            f'<div><img src="https://img.wm24.de/{rng.randrange(10**9)}.jpg"/></div>'
            for _ in range(rng.randint(1, 4))
        )
        parts.append(f'<div class="carousel-inner">{imgs}</div>')
    if gone:
        parts.append("<p>Objekt nicht mehr verfügbar.</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_wm24_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    base = f"https://www.wohnungsmarkt24.de/{'haus' if haus else 'wohnung'}-{sucht}-stadt{stadtid}"
    seed_url = base + "_p1.html"
    last_page = rng.randint(2, 4)
    detail_ids = []

    def new_detail():
        if detail_ids and rng.random() < 0.06:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(6, 10)
        heads = []
        for _ in range(n):
            did = new_detail()
            href = f"anzeige/{did}.html"  # relative; '/'-concat (quirk)
            heads.append(f'<h3 class="headline-se-1"><a href="{href}">anzeige</a></h3>')
            sink.add(
                "https://www.wohnungsmarkt24.de/" + href,
                _wm24_detail_body(rng, city, haus, kaufen, gone=rng.random() < 0.02),
            )
        nxt = (
            f'<a class="nextLink slink" href="{base}_p{page + 1}.html">weiter</a>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>WM24 {city['stadt']} Seite {page}</h1>
{"".join(heads)}
{nxt}
</body></html>"""
        sink.add(base + f"_p{page}.html", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "wohnungsmarkt24",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# ohne-makler page grammar (ohnemakler.py:74-189)
# ---------------------------------------------------------------------------

def _ohnemakler_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} von privat"
    parts = [f'<h1 class="blue">{title}</h1>']
    if rng.random() < 0.9:
        parts.append(f"<p>Zimmer (Anzahl):<br/>{rng.choice(['2', '3', '4'])}</p>")
    if rng.random() < 0.9:
        parts.append(f"<p>Wohnfläche:<br/>{rng.choice(['75,5 m²', '60 m²', '102 m²'])}</p>")
    if kaufen:
        if rng.random() < 0.9:
            parts.append(f"<p>Kaufpreis: <span>{rng.choice(_BUY_PRICES)}</span></p>")
        if rng.random() < 0.4:
            parts.append("<p>Diese Immobilie ist provisionsfrei</p>")
    else:
        r = rng.random()
        if r < 0.3:
            parts.append(f"<p>Pauschal: <span>{rng.choice(_RENT_PRICES)}</span></p>")
        else:
            # arithmetic-sum path (ohnemakler.py:136-142); sometimes parts
            # missing → item dropped
            if r < 0.9:
                parts.append(f"<p>Kaltmiete: <span>{rng.choice(['450 €', '1.200 €', '635 €'])}</span></p>")
            if r < 0.85 or r >= 0.9:
                parts.append(f"<p>Nebenkosten:<br/>{rng.choice(['120 €', '95 €', '210 €'])}</p>")
    if haus and rng.random() < 0.8:
        parts.append(f"<p>Grundstücksfläche:<br/>{rng.choice(['250 m²', '410 m²'])}</p>")
    feats = rng.sample(
        ["Keller", "Balkon", "Garage", "Garten", "Einbauküche",
         "Haustiere erlaubt", "Barrierefrei", "Möbliert", "Terrasse"],
        rng.randint(0, 4),
    )
    for f in feats:
        parts.append(f"<p>{f}</p>")
    for _ in range(rng.randint(0, 4)):
        parts.append(f'<a class="pictures lightbox" href="/media/{rng.randrange(10**9)}.jpg">bild</a>')
    # adresse block — missing 5% → item dropped (ohnemakler.py:179)
    parts.append('<div class="span4">x</div><div class="span4">y</div>')
    if rng.random() < 0.95:
        parts.append(
            f'<div class="span4"><h4>Anbieter</h4><p>{rng.choice(_STREETS)} '
            f'{rng.randint(1, 180)}, {city["stadt"]}</p></div>'
        )
    else:
        parts.append('<div class="span4"><h4>Anbieter</h4></div>')
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_ohnemakler_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    base = f"https://www.ohne-makler.net/immobilien/{'haus' if haus else 'wohnung'}-{sucht}/stadt{stadtid}"
    seed_url = base + "/1/"
    last_page = rng.randint(2, 4)
    detail_ids = []

    def new_detail():
        if detail_ids and rng.random() < 0.06:
            return rng.choice(detail_ids)
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(6, 10)
        anchors = []
        for _ in range(n):
            did = new_detail()
            href = f"immobilie/{did}/"  # relative, '/'-concat
            anchors.append(f'<a class="red" href="{href}">anzeige</a>')
            sink.add(
                "https://www.ohne-makler.net/" + href,
                _ohnemakler_detail_body(rng, city, haus, kaufen,
                                        gone=rng.random() < 0.02),
            )
        nxt = (
            f'<li class="next"><a href="{base}/{page + 1}/">weiter</a></li>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>ohne-makler {city['stadt']} Seite {page}</h1>
{"".join(anchors)}
<ul>{nxt}</ul>
</body></html>"""
        sink.add(base + f"/{page}/", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "ohnemakler",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# sueddeutsche page grammar (JSON listing, sueddeutsche.py:64-183)
# ---------------------------------------------------------------------------

def _sueddeutsche_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    parts = [f'<h1 class="exposeTitle">{title}</h1>']
    rows = []
    if kaufen:
        if rng.random() < 0.9:
            rows.append(
                f"<tr><td><span>Kaufpreis</span></td><td><div>{rng.choice(_BUY_PRICES)}</div></td></tr>"
            )
        if rng.random() < 0.4:
            parts.append("<p>Provisionsfrei für den Käufer</p>")
    else:
        r = rng.random()
        if r < 0.5:
            rows.append(
                f"<tr><td><span>Miete inkl. NK</span></td><td><div>{rng.choice(_RENT_PRICES)}</div></td></tr>"
            )
        elif r < 0.85:
            rows.append(
                f"<tr><td><span>Miete zzgl. NK</span></td><td><div>{rng.choice(_RENT_PRICES)}</div></td></tr>"
            )
    if haus:
        rows.append(
            f'<tr><td class="firstTd2">G1</td><td><div>x</div></td></tr>'
            f'<tr><td class="firstTd2">G2</td><td><div>{rng.choice(["250 m²", "410 m²"])}</div></td></tr>'
        )
    if rows:
        parts.append("<table>" + "".join(rows) + "</table>")
    if rng.random() < 0.9:
        parts.append(
            '<div class="cell"><div><b>Wohnfläche</b></div>'
            f'<div class="value">{rng.choice(["75,5 m²", "60 m²", "102 m²"])}</div></div>'
        )
    if rng.random() < 0.85:
        parts.append(
            '<div class="cell2"><span>Zimmeranzahl</span>'
            f'<div class="value">{rng.choice(["2", "3", "4"])}</div></div>'
        )
    if rng.random() < 0.85:
        spans = [
            f"<span>{rng.randint(80000, 99999)},</span>",
            f"<span>{city['stadt']}</span>",
            "<span>Bayern</span>",
            f"<span>{rng.choice(city['stadtviertel'])}</span>",
        ]
        parts.append(f'<div class="exposeAddr"><div>{"".join(spans)}</div></div>')
    feats = rng.sample(
        ["Keller", "Garage", "Haustier erlaubt", "barrierefrei", "Möbliert",
         "Einbauküche", "Balkon", "Terrasse", "Garten"],
        rng.randint(0, 4),
    )
    if feats:
        parts.append(
            '<div class="hideContentInner">'
            + "".join(f"<p>{f}</p>" for f in feats)
            + "</div>"
        )
    if rng.random() < 0.6:
        imgs = "".join(
            f'<li><img src="https://img.sz.de/{rng.randrange(10**9)}.jpg"/></li>'
            for _ in range(rng.randint(1, 4))
        )
        parts.append(f'<ul class="imageSliderThumbs">{imgs}</ul>')
    if gone:
        parts.append("<p>Objekt nicht mehr verfügbar.</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_sueddeutsche_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    seed_url = (
        "https://immobilienmarkt.sueddeutsche.de/api/search"
        f"?city={stadtid}&art={sucht}&obj={'haus' if haus else 'wohnung'}"
    )
    n = rng.randint(8, 16)
    results = []
    detail_ids = []
    for _ in range(n):
        if detail_ids and rng.random() < 0.06:
            did = rng.choice(detail_ids)
        else:
            did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
            detail_ids.append(did)
        href = f"/expose/{did}"
        results.append({"url": href, "id": did})
        sink.add(
            "https://immobilienmarkt.sueddeutsche.de" + href,
            _sueddeutsche_detail_body(rng, city, haus, kaufen,
                                      gone=rng.random() < 0.02),
        )
    body = json.dumps({"searchResult": {"result": results}}, ensure_ascii=False)
    sink.add(seed_url, body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "sueddeutsche",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# wohnungsboerse page grammar (wohnungsboerse.py:72-182; no pagination)
# ---------------------------------------------------------------------------

def _wohnungsboerse_detail_body(rng, city, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    parts = [f'<h2 class="dotdotdot">{title}</h2>']
    if rng.random() < 0.85:
        parts.append(f"<dl><dt>ZIMMER</dt><dd>{rng.choice(['2', '3', '4'])}</dd></dl>")
    if rng.random() < 0.85:
        parts.append(f"<dl><dt>FLÄCHE</dt><dd>{rng.choice(['75,5 m²', '60 m²'])}</dd></dl>")
    if kaufen:
        if rng.random() < 0.9:
            parts.append(
                f"<dl><dt>KAUFPREIS</dt><dd>{rng.choice(_BUY_PRICES)}</dd></dl>"
            )
        if rng.random() < 0.5:
            parts.append("<p>Provision: 3,57%</p>")  # 'Provision' → 1 (quirk)
    else:
        if rng.random() < 0.9:
            parts.append(
                f"<div><div><b>Gesamtmiete</b></div><div><div>{rng.choice(_RENT_PRICES)}</div></div></div>"
            )
    if haus and rng.random() < 0.7:
        parts.append(
            f"<div><div>Grundstücksfläche:</div><div>{rng.choice(['250 m²', '410 m²'])}</div></div>"
        )
    feats = rng.sample(
        ["Keller", "Balkon", "Garage", "Haustiere erlaubt",
         "Stufenloser Zugang", "Möbliert", "Terrasse"],
        rng.randint(0, 3),
    )
    for f in feats:
        parts.append(f"<p>{f}</p>")
    for _ in range(rng.randint(0, 4)):
        parts.append(
            f'<img src="https://cdn.wohnungsboerse.net/img/thumbs/{rng.randrange(10**9)}.jpg"/>'
        )
    if rng.random() < 0.85:
        parts.append(
            f'<div class="mb-2 mb-lg-3 pl-3 pl-lg-0">{rng.choice(_STREETS)} '
            f'{rng.randint(1, 180)}, {city["stadt"]}</div>'
        )
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_wohnungsboerse_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    sucht = "kaufen" if kaufen else "mieten"
    seed_url = (
        f"https://www.wohnungsboerse.net/searches/{'haus' if haus else 'wohnung'}-{sucht}-stadt{stadtid}"
    )
    n = rng.randint(8, 16)
    anchors = []
    detail_ids = []
    for _ in range(n):
        if detail_ids and rng.random() < 0.06:
            did = rng.choice(detail_ids)
        else:
            did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
            detail_ids.append(did)
        if rng.random() < 0.15:
            href = f"https://www.wohnungsboerse.net/immodetail/{did}"
        else:
            href = f"/immodetail/{did}"
        durl = href if "wohnungsboerse" in href else "https://www.wohnungsboerse.net" + href
        thumb = (
            f'<img data-src="https://cdn.wohnungsboerse.net/img/thumbs/t{did}.jpg"/>'
            if rng.random() < 0.8
            else ""
        )
        anchors.append(f'<a href="{href}">{thumb}anzeige</a>')
        sink.add(
            durl,
            _wohnungsboerse_detail_body(rng, city, haus, kaufen,
                                        gone=rng.random() < 0.02),
        )
    body = f"""<html><body>
<h1>Wohnungsboerse {city['stadt']}</h1>
{"".join(anchors)}
</body></html>"""
    sink.add(seed_url, body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "wohnungsboerse",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# meinestadt page grammar (JSON listing + detail hop, meinestadt.py:76-190)
# ---------------------------------------------------------------------------

_MS_EQUIP = ["Tiefgarage", "Garten", "Balkon", "Personenaufzug", "Stellplatz",
             "Terrasse", "Einbauküche", "Kelleranteil", "provisionsfrei",
             "Parkett", "Fußbodenheizung"]


def _meinestadt_detail_body(rng, city, gone=False):
    parts = []
    if rng.random() < 0.85:
        parts.append(
            f'<div class="location loc">{rng.choice(_STREETS)} '
            f'{rng.randint(1, 180)}, {city["stadt"]}</div>'
        )
    parts.append('<div class="section_content"><p>Beschreibung</p></div>')
    if rng.random() < 0.7:
        parts.append(f'<div class="section_content"><p>{rng.choice(_DATES)}</p></div>')
    if rng.random() < 0.6:
        imgs = "".join(
            f'<div class="m-gallery__imageContainer x"><img class="ImageNormal y" '
            f'data-flickity-lazyload-src="https://pic.ms.de/{rng.randrange(10**9)}.jpg"/></div>'
            for _ in range(rng.randint(1, 4))
        )
        parts.append(imgs)
    elif rng.random() < 0.5:
        parts.append(
            f'<meta content="https://media-pics2.immowelt.org/{rng.randrange(10**9)}.jpg"/>'
        )
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_meinestadt_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    seed_url = (
        "https://www.meinestadt.de/api/immo"
        f"?service=immoweltAjax&city={stadtid}&etype={haus}&esr={kaufen}&pageSize=100"
    )
    n = rng.randint(8, 16)
    items = []
    for k in range(n):  # unique detailUrls (Scrapy request dupefilter)
        did = f"{stadtid}{haus}{kaufen}{k:04d}"
        durl = f"https://www.meinestadt.de/immobilien/expose/{did}"
        equip = ", ".join(rng.sample(_MS_EQUIP, rng.randint(0, 5)))
        it = {
            "title": f"{rng.choice(_TITLE_ADJ)} {'Haus' if haus else 'Wohnung'} in {city['stadt']}",
            "detailUrl": durl,
            "rooms": rng.choice([2, 3, 4, 2.5]),
            "livingAreaRaw": rng.choice([48, 60, 75, 102]),
            "latitude": round(48.0 + rng.random(), 6),
            "longitude": round(10.0 + rng.random(), 6),
            "priceRaw": rng.choice([450, 635, 780, 299000, 450000]),
            "equipmentAsString": equip,
        }
        if haus == 1:
            it["landAreaRaw"] = rng.choice([250, 410, 620])
        if rng.random() < 0.05:
            del it["rooms"]  # per-estate KeyError → estate skipped (quirk)
        items.append(it)
        sink.add(durl, _meinestadt_detail_body(rng, city, gone=rng.random() < 0.02))
    sink.add(seed_url, json.dumps({"searchboxResults": {"items": items}},
                                  ensure_ascii=False))
    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "meinestadt",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# sparkasse page grammar (single JSON API page, sparkasse.py:58-169;
# kaufen=0 seeds are no-ops → only kaufen=1 seeds are emitted)
# ---------------------------------------------------------------------------

def _gen_sparkasse_city(rng, sink, city, haus, kaufen, seed_id):
    if kaufen == 0:
        return None  # sparkasse.py:51-52
    stadtid = city["id"]
    seed_url = (
        "https://immobilien.sparkasse.de/api/estate/"
        f"?city={stadtid}&type={'buy_residential_house' if haus else 'buy_residential_flat'}"
    )
    n = rng.randint(6, 14)
    estates = []
    for k in range(n):
        did = f"immobilie/{stadtid}{haus}{kaufen}{k:04d}"
        # image count drives the bildN / double-yield quirk:
        # <2 images → item yielded twice; ≥2 → page aborts at this estate
        n_img = rng.choices([0, 1, 2, 3], weights=[40, 40, 10, 10])[0]
        est = {
            "id": did,
            "freitexte": {"objekttitel": f"{rng.choice(_TITLE_ADJ)} Objekt in {city['stadt']}"},
            "preise": {"kaufpreis": rng.choice(["450.000", "299000", "1.250.000", "385000"])},
            "flaechen": {"wohnflaeche": rng.choice(["75.5", "60", "102"])},
            "ausstattung": {},
            "sip": {
                "images": [
                    {"formats": {"original": f"https://img.sparkasse.de/{rng.randrange(10**9)}.jpg",
                                 "m": f"https://img.sparkasse.de/m{rng.randrange(10**9)}.jpg"}}
                    for _ in range(n_img)
                ],
            },
        }
        if rng.random() < 0.8:
            est["flaechen"]["anzahl_zimmer"] = rng.choice(["3.0", "2.5", "4.0"])
        if rng.random() < 0.6:
            est["preise"]["aussen_courtage"] = rng.choice(["prov.frei", "3,57 %"])
        if rng.random() < 0.3:
            est["anzahl_terrassen"] = 1
        if rng.random() < 0.3:
            est["ausstattung"]["unterkellert"] = True
        if haus and rng.random() < 0.7:
            est["flaechen"]["grundstuecksflaeche"] = rng.choice(["250", "410"])
        if rng.random() < 0.85:
            est["geo"] = {"ort": city["stadt"]}
            if rng.random() < 0.8:
                est["geo"]["strasse"] = f"{rng.choice(_STREETS)} {rng.randint(1, 180)}"
        if rng.random() < 0.4:
            est["sip"]["display_data"] = {
                "specials": ", ".join(rng.sample(
                    ["Garten", "Balkon", "Personenaufzug", "Stellplatz",
                     "Garage", "Terrasse"], rng.randint(1, 3)))
            }
        if rng.random() < 0.3:
            est["EBK"] = True
            est["kueche"] = {"attributes": {"EBK": rng.choice(["true", "false"])}}
        if rng.random() < 0.3:
            est["gartennutzung"] = True
            est["ausstattung"]["gartennutzung"] = rng.choice(["true", "false"])
        estates.append(est)
    sink.add(seed_url, json.dumps({"_embedded": {"estate": estates}},
                                  ensure_ascii=False))
    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "sparkasse",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# wg-suche page grammar (JSON list + per-offer API, wgsuche.py:57-127;
# WG seeds use haus=2 — emitted once per city on the (0,0) combo)
# ---------------------------------------------------------------------------

def _gen_wgsuche_city(rng, sink, city, haus, kaufen, seed_id):
    if (haus, kaufen) != (0, 0):
        return None  # one WG seed per city
    stadtid = city["id"]
    seed_url = f"https://api.wg-suche.de/v1_0/offers?city={stadtid}&limit=100"
    n = rng.randint(8, 16)
    offers = []
    for k in range(n):
        oid = f"{stadtid}2{k:04d}"
        offers.append({"id": oid})
        offer = {
            "id": oid,
            "title": f"WG-Zimmer in {city['stadt']} {rng.choice(city['stadtviertel'])}",
            "rent": rng.choice([300, 420, 550, 680]),
            "images": [
                {"urls": {"ORIGINAL": {"url": f"https://img.wg-suche.de/{rng.randrange(10**9)}.jpg"}}}
                for _ in range(rng.randint(0, 3))
            ],
        }
        if rng.random() < 0.8:
            offer["flatSize"] = rng.choice([80, 95, 120])
        if rng.random() < 0.9:
            offer["size"] = rng.choice([12, 16, 20, 38])
        if rng.random() < 0.7:
            offer["borough"] = rng.choice(city["stadtviertel"])
        if rng.random() < 0.8:
            offer["street"] = rng.choice(_STREETS)
            if rng.random() < 0.8:
                offer["streetNumber"] = str(rng.randint(1, 180))
        if rng.random() < 0.6:
            offer["from"] = rng.choice(["2021-06-01", "sofort", "01.07.21"])
        if rng.random() < 0.5:
            offer["membersWomanCount"] = rng.randint(0, 3)
        if rng.random() < 0.5:
            offer["membersManCount"] = rng.randint(0, 3)
        if rng.random() < 0.4:
            offer["wantedAmountFemale"] = 1
        if rng.random() < 0.4:
            offer["wantedAmountMale"] = 1
        if rng.random() < 0.2:
            offer["wantedAmountEven"] = 1
        for flag in ("garden", "balcony", "elevator", "barrierFree"):
            if rng.random() < 0.4:
                offer[flag] = rng.random() < 0.6
        if rng.random() < 0.85:  # missing → item dropped (images quirk)
            offer["furnished"] = rng.random() < 0.5
        sink.add(
            f"https://api.wg-suche.de/v1_0/offer/{oid}",
            json.dumps(offer, ensure_ascii=False),
        )
    sink.add(seed_url, json.dumps({"result": offers}, ensure_ascii=False))
    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": 2, "kaufen": 0, "portal": "wgsuche",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# immowelt page grammar (immowelt.py:141-310; Selenium walk modelled by the
# listing pages carrying absolute expose hrefs)
# ---------------------------------------------------------------------------

def _immowelt_detail_body(rng, city, canon_url, haus, kaufen, gone=False):
    adj = rng.choice(_TITLE_ADJ)
    title = f"{adj} {'Haus' if haus else 'Wohnung'} in {city['stadt']}"
    hardfacts = [
        f'<div class="hardfact ">{rng.choice(_RENT_PRICES if not kaufen else _BUY_PRICES)}</div>'
    ]
    if rng.random() < 0.9:
        hardfacts.append(f'<div class="hardfact ">{rng.choice(["75,5 m²", "60 m²", "102 m²"])}</div>')
    if rng.random() < 0.6:
        hardfacts.append(f'<div class="hardfact ">{rng.choice(["250 m²", "410 m²"])}</div>')
    if rng.random() < 0.85:
        hardfacts.append(f'<div class="hardfact rooms">{rng.choice(["2", "3", "4"])} Zimmer</div>')
    parts = [
        '<div class="quickfacts iw_left">'
        f"<h1>{title}</h1>"
        f'<div class="hardfacts">{"".join(hardfacts)}</div>'
        "</div>"
    ]
    # carousel images → bildN quirk drops the item (immowelt.py:218-236);
    # ~45% image-less exposés actually yield items
    n_img = rng.choices([0, 1, 2, 4], weights=[45, 20, 20, 15])[0]
    for _ in range(n_img):
        if rng.random() < 0.3:
            parts.append(
                '<div class="carousel-item"><img src="/App_Themes/ph.png" '
                f'data-src="https://pic.immowelt.de/{rng.randrange(10**9)}.jpg"/></div>'
            )
        else:
            parts.append(
                f'<div class="carousel-item"><img src="https://pic.immowelt.de/{rng.randrange(10**9)}.jpg"/></div>'
            )
    # kaltmiete block first (TakeFirst on datacontent strong)
    parts.append(f'<div class="datacontent iw_right"><strong>{rng.choice(_RENT_PRICES)}</strong></div>')
    if not kaufen:
        r = rng.random()
        if r < 0.6:
            parts.append(
                f"<div class='warm'><div>Warmmiete </div><div>{rng.choice(_RENT_PRICES)}</div></div>"
            )
        elif r < 0.85:
            parts.append(
                "<div class='warmalt'><p><strong>Warmmiete </strong></p>"
                f"<div class='datacontent iw_right'><strong>{rng.choice(_RENT_PRICES)}</strong></div></div>"
            )
        if rng.random() < 0.6:
            parts.append(
                f"<div class='fact'><div>Nebenkosten</div><div>{rng.choice(_NEBENK)}</div></div>"
            )
    else:
        if rng.random() < 0.4:
            parts.append("<strong>provisionsfrei</strong>")
    # sections: //div[2]/div[@class='section_content iw_right']/p
    typ = "Haus" if haus else "Wohnung"
    parts.append(
        "<div class='sections'><div>intro</div>"
        f"<div><div class='section_content iw_right'><p>{typ} "
        f"<strong>{rng.choice(_DATES)}</strong></p><p>ab {rng.choice(_DATES)}</p></div></div></div>"
    )
    feats = rng.sample(
        ["Terrasse vorhanden", "Kelleranteil", "Garten", "Einbauküche",
         "Personenaufzug", "Balkon", "barrierefrei", "Haustiere erlaubt",
         "Stellplatz"],
        rng.randint(0, 4),
    )
    for f in feats:
        parts.append(f"<span>{f}</span>")
    if rng.random() < 0.8:
        parts.append(
            f'<div class="location"><span>{rng.choice(_STREETS)} {rng.randint(1, 180)}</span>'
            f'<span>{rng.choice(city["stadtviertel"])}</span></div>'
        )
    parts.append(f'<input class="js-endlink-input" value="{canon_url}"/>')
    if gone:
        parts.append("<p>Angebot wurde deaktiviert</p>")
    return "<html><body>\n" + "\n".join(parts) + "\n</body></html>"


def _gen_immowelt_city(rng, sink, city, haus, kaufen, seed_id):
    stadtid = city["id"]
    obj = "haeuser" if haus == 1 else "wohnungen"
    sucht = "kaufen" if kaufen else "mieten"
    seed_url = (
        f"https://www.immowelt.de/liste/{city['stadt'].lower()}{stadtid}"
        f"/{obj}/{sucht}?sort=relevanz"
    )
    # ≤5 content pages (the 6th-with-next dead-end is exercised rarely)
    last_page = rng.choices([2, 3, 4, 5, 7], weights=[30, 30, 20, 15, 5])[0]
    detail_ids = []

    def new_detail():
        did = f"{stadtid}{haus}{kaufen}{len(detail_ids):04d}"
        detail_ids.append(did)
        return did

    for page in range(1, last_page + 1):
        n = rng.randint(3, 5)
        anchors = []
        for _ in range(n):
            did = new_detail()
            durl = f"https://www.immowelt.de/expose/{did}"
            href = durl + ("?bc=1" if rng.random() < 0.15 else "")
            anchors.append(f'<a href="{href}">exposé</a>')
            sink.add(
                durl,
                _immowelt_detail_body(rng, city, durl, haus, kaufen,
                                      gone=rng.random() < 0.02),
            )
        nxt = (
            f'<a id="nlbPlus" href="{seed_url}&cp={page + 1}">mehr</a>'
            if page < last_page
            else ""
        )
        body = f"""<html><body>
<h1>Immowelt {city['stadt']} Seite {page}</h1>
{"".join(anchors)}
{nxt}
</body></html>"""
        sink.add(seed_url if page == 1 else seed_url + f"&cp={page}", body)

    return {
        "seed_id": seed_id, "stadtid": stadtid, "stadtname": city["stadt"],
        "haus": haus, "kaufen": kaufen, "portal": "immowelt",
        "url": seed_url, "chatid": None,
    }


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

PORTAL_GENERATORS = {
    "immonet": _gen_immonet_city,
    "immoscout": _gen_immoscout_city,
    "ebay": _gen_ebay_city,
    "kalay": _gen_kalay_city,
    "berlin": _gen_berlin_city,
    "wohnungsmarkt24": _gen_wm24_city,
    "ohnemakler": _gen_ohnemakler_city,
    "sueddeutsche": _gen_sueddeutsche_city,
    "wohnungsboerse": _gen_wohnungsboerse_city,
    "meinestadt": _gen_meinestadt_city,
    "sparkasse": _gen_sparkasse_city,
    "wgsuche": _gen_wgsuche_city,
    "immowelt": _gen_immowelt_city,
}


def make_cities(n):
    rng = random.Random(SEED * 7 + 1)
    cities = []
    for i in range(n):
        base = _CITY_BASE[i] if i < len(_CITY_BASE) else f"Synthstadt{i:04d}"
        nv = rng.randint(4, 12)
        viertel = rng.sample(_VIERTEL_POOL, min(nv, len(_VIERTEL_POOL)))
        cities.append({"id": 400 + i, "stadt": base, "stadtviertel": viertel})
    return cities


def _gen_city_payload(args):
    """One city's pages + seeds (worker for the parallel generate).

    Returns raw (urls, bodies, langs, seeds-without-ids); the parent merges
    in city order through one global PageSink, so the output is
    byte-identical to the original sequential loop (same page order, same
    warc_ts counter, same cross-city URL dedup, same seed numbering)."""
    city, portals = args
    sink = PageSink()
    seeds = []
    for haus, kaufen in COMBOS:
        for portal in portals:
            rng = random.Random(f"{SEED}|{city['id']}|{haus}|{kaufen}|{portal}")
            seed = PORTAL_GENERATORS[portal](rng, sink, city, haus, kaufen, None)
            if seed is not None:
                seeds.append(seed)
    return sink.urls, sink.text, sink.lang, seeds


def generate(tier: str, out_dir: str, portals=None, force=False) -> str:
    """Generate fixture tables for a tier into ``out_dir``; cached."""
    cfg = TIERS[tier]
    portals = portals or list(PORTAL_GENERATORS)
    manifest = {
        "tier": tier,
        "seed": SEED,
        "cities": cfg["cities"],
        "portals": sorted(portals),
        "v": 2,
    }
    mpath = os.path.join(out_dir, "_manifest.json")
    if not force and os.path.exists(mpath):
        with open(mpath) as f:
            if json.load(f) == manifest:
                if tier == "tiny":
                    _write_expected(out_dir)  # no-op when already present
                _write_images(out_dir)  # no-op when already present
                _write_discovery(out_dir)  # no-op when already present
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    cities = make_cities(cfg["cities"])
    sink = PageSink()
    seeds = []
    sid = 0

    def _merge(city_payload):
        nonlocal sid
        urls, bodies, langs, cseeds = city_payload
        for u, b, l in zip(urls, bodies, langs):
            sink.add(u, b, lang=l)
        for s in cseeds:
            s["seed_id"] = f"seed{sid:05d}"
            seeds.append(s)
            sid += 1

    jobs = [(city, portals) for city in cities]
    if len(cities) >= 30 and os.environ.get("SPARK_GRAFT_SYNTH_SERIAL") != "1":
        # big tiers: fan the per-city grammar work (pure CPU: rng + string
        # building) across cores; ordered imap + the single parent-side
        # PageSink keep the output byte-identical to the serial loop
        import multiprocessing

        workers = min(len(os.sched_getaffinity(0)), 32)
        with multiprocessing.Pool(workers) as pool:
            for payload in pool.imap(_gen_city_payload, jobs, chunksize=4):
                _merge(payload)
    else:
        for job in jobs:
            _merge(_gen_city_payload(job))

    # a few non-German distractor pages (lang filter exercise)
    rng = random.Random(SEED + 99)
    for i in range(max(5, cfg["cities"] // 3)):
        sink.add(
            f"https://example.org/en/{i}",
            f"<html><body><p>english page {i} {rng.random()}</p></body></html>",
            lang="en",
        )

    # small row groups: parquet scan splits materialize rows only at
    # row-group boundaries, so a single default-row-group file would pin
    # every wave's fetch-join map side to ONE core no matter what
    # maxPartitionBytes/minPartitionNum say.  2048-row groups give the
    # local[32] scan >=32 non-empty splits from sf0.01 up (the stand-in for
    # the production pages table being bucketed/split by Iceberg).
    pq.write_table(sink.table(), os.path.join(out_dir, "pages.parquet"),
                   row_group_size=2048)

    pq.write_table(
        pa.table(
            {
                "seed_id": [s["seed_id"] for s in seeds],
                "stadtid": pa.array([s["stadtid"] for s in seeds], pa.int64()),
                "stadtname": [s["stadtname"] for s in seeds],
                "haus": pa.array([s["haus"] for s in seeds], pa.int32()),
                "kaufen": pa.array([s["kaufen"] for s in seeds], pa.int32()),
                "portal": [s["portal"] for s in seeds],
                "url": [s["url"] for s in seeds],
                "chatid": pa.array([s["chatid"] for s in seeds], pa.string()),
            }
        ),
        os.path.join(out_dir, "seeds.parquet"),
    )

    pq.write_table(
        pa.table(
            {
                "id": pa.array([c["id"] for c in cities], pa.int64()),
                "stadt": [c["stadt"] for c in cities],
                "stadtviertel": pa.array(
                    [c["stadtviertel"] for c in cities], pa.list_(pa.string())
                ),
            }
        ),
        os.path.join(out_dir, "stadte.parquet"),
    )

    netlocs = ["www.immonet.de", "www.immobilienscout24.de", "www.immowelt.de",
               "www.ebay-kleinanzeigen.de", "www.kalaydo.de", "www.berlin.de",
               "www.wohnungsboerse.net", "www.wohnungsmarkt24.de",
               "www.ohne-makler.net", "www.meinestadt.de", "api.wg-suche.de",
               "immobilienmarkt.sueddeutsche.de", "immobilien.sparkasse.de"]
    pq.write_table(
        pa.table(
            {
                "netloc": netlocs,
                # settings.py:53-55: DOWNLOAD_DELAY=10, 1 req/domain
                "crawl_delay_s": pa.array([10.0] * len(netlocs), pa.float64()),
                "max_concurrent": pa.array([1] * len(netlocs), pa.int32()),
                "disallow_prefixes": pa.array(
                    [["/intern/", "/admin/"]] * len(netlocs), pa.list_(pa.string())
                ),
            }
        ),
        os.path.join(out_dir, "robots.parquet"),
    )

    # deterministic geocache (J3/J4 fixture): hash-derived coords
    addrs, lats, lons, subs = [], [], [], []
    rng2 = random.Random(SEED + 7)
    for c in cities[: min(len(cities), 200)]:
        for st in _STREETS:
            a = f"{st} {rng2.randint(1, 180)}, {c['stadt']}"
            addrs.append(a)
            # crc32 (not hash()) — PYTHONHASHSEED-independent determinism
            lats.append(48.0 + (zlib.crc32(a.encode()) % 10_000) / 10_000.0)
            lons.append(10.0 + (zlib.crc32(a[::-1].encode()) % 10_000) / 10_000.0)
            subs.append(rng2.choice(c["stadtviertel"]))
    pq.write_table(
        pa.table({"address": addrs, "lat": lats, "lon": lons, "suburb": subs}),
        os.path.join(out_dir, "geocache.parquet"),
    )

    if tier == "tiny":
        _write_expected(out_dir)
    _write_images(out_dir)
    _write_discovery(out_dir)

    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return out_dir


def bmp_bytes(width: int, height: int, rng) -> bytes:
    """A real 24-bit uncompressed BMP (BITMAPINFOHEADER) — decodable with
    a pure-python header parse, no codec library required."""
    row = (3 * width + 3) // 4 * 4
    pixels = bytes(rng.randrange(256) for _ in range(row * height))
    header = (
        b"BM"
        + (54 + len(pixels)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixels


def ppm_bytes(width: int, height: int, rng) -> bytes:
    """A real binary PPM (P6) with a comment line in the header."""
    pixels = bytes(rng.randrange(256) for _ in range(3 * width * height))
    return (
        f"P6\n# synthetic fixture image\n{width} {height}\n255\n".encode() + pixels
    )


def clustered_embedding_rows(
    n: int = 3000, dim: int = 32, n_clusters: int = 48,
    zipf_a: float = 1.3, noise: float = 0.18, seed: int = None,
):
    """Deterministic Zipf-clustered embeddings — the realistic ANN regime.

    Real embedding corpora are clustered with heavy-tailed cluster sizes
    (near-duplicate families, template pages, topic lumps) — near-random
    vectors are PQ/IVF's documented WORST case, so recall measured there
    transfers only directionally.  This generator plants ``n_clusters``
    Gaussian anchors with cluster sizes ∝ 1/rank^zipf_a and members =
    anchor + noise·N(0,1): nearest neighbors are overwhelmingly
    within-cluster, like production embeddings.

    Returns ``[(vec_id, cluster_id, [floats…]), …]``; cluster_id is kept
    as ground truth for recall analysis.
    """
    import numpy as np

    rng = np.random.RandomState(SEED + 77 if seed is None else seed)
    weights = 1.0 / np.arange(1, n_clusters + 1) ** zipf_a
    sizes = np.maximum(1, np.round(weights / weights.sum() * n)).astype(int)
    anchors = rng.randn(n_clusters, dim) * 4.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(int(sizes[c])):
            v = anchors[c] + noise * rng.randn(dim)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return rows


_CLUSTERED_EMB_V = 1


def _write_clustered_embeddings(fix_dir: str) -> str:
    """Materialize the Zipf-clustered embedding table in the fixture
    (idempotent, versioned like images.parquet)."""
    path = os.path.join(fix_dir, "embeddings_clustered.parquet")
    vpath = os.path.join(fix_dir, "_embeddings_clustered.v")
    if os.path.exists(path):
        try:
            with open(vpath) as f:
                if f.read().strip() == str(_CLUSTERED_EMB_V):
                    return path
        except OSError:
            pass
    rows = clustered_embedding_rows()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "cluster_id": pa.array([r[1] for r in rows], pa.int32()),
                "embedding": pa.array(
                    [r[2] for r in rows], pa.list_(pa.float64())
                ),
            }
        ),
        path,
    )
    with open(vpath, "w") as f:
        f.write(str(_CLUSTERED_EMB_V))
    return path


def png_bytes(width: int, height: int, rng, channels: int = 3) -> bytes:
    """A real PNG (8-bit gray/rgb/rgba, filter 0, one zlib IDAT) via the
    engine's own encoder — decodable by any PNG reader."""
    import numpy as np

    from ..operators.multimodal import encode_png

    arr = np.array(
        [rng.randrange(256) for _ in range(width * height * channels)],
        dtype=np.uint8,
    ).reshape(height, width, channels)
    return encode_png(arr)


_DISCOVERY_V = 1


def robots_txt_body(netloc: str, crawl_delay_s: float,
                    disallow_prefixes, style: int = 0) -> str:
    """Render a robots.txt body EQUIVALENT to one robots-table row (the
    inverse of operators/robotstxt.py:parse_robots — parse(render(row))
    must reproduce the row, which tests/test_discovery.py proves).
    ``style`` varies formatting/extras so the parser sees realistic
    variety, never different semantics."""
    dis = "".join(f"Disallow: {p}\n" for p in disallow_prefixes)
    sitemap = f"Sitemap: https://{netloc}/sitemap.xml\n"
    if style % 3 == 1:  # specific-agent group first; '*' group still wins
        return (
            f"# robots for {netloc}\n"
            "User-agent: specialbot\nDisallow: /\n\n"
            f"User-agent: *\n{dis}Crawl-delay: {crawl_delay_s:g}\n"
            + sitemap
        )
    if style % 3 == 2:  # comments, CRLF, Allow extras
        return (
            f"User-agent: * # alle\r\n{dis}"
            "Allow: /public/\r\n"
            f"Crawl-delay: {crawl_delay_s:g}\r\n\r\n" + sitemap
        )
    return (f"User-agent: *\n{dis}Crawl-delay: {crawl_delay_s:g}\n"
            + sitemap)


def _write_discovery(fix_dir: str) -> None:
    """Discovery-loop fixture: per-host robots.txt BODIES (rendered from
    the tier's robots table) and per-host sitemap XML documents (listing
    the tier's real page URLs; the first host gets a two-level
    sitemapindex).  Deterministic; versioned like images.parquet."""
    rpath = os.path.join(fix_dir, "robots_txt.parquet")
    spath = os.path.join(fix_dir, "sitemaps.parquet")
    vpath = os.path.join(fix_dir, "_discovery.v")
    if os.path.exists(rpath) and os.path.exists(spath):
        try:
            with open(vpath) as f:
                if f.read().strip() == str(_DISCOVERY_V):
                    return
        except OSError:
            pass
    import re as _re

    robots = pq.read_table(os.path.join(fix_dir, "robots.parquet")).to_pylist()
    pages = pq.read_table(os.path.join(fix_dir, "pages.parquet"),
                          columns=["url"])
    by_host: dict = {}
    for u in pages.column("url").to_pylist():
        m = _re.match(r"https?://([^/]+)", u)
        if m:
            by_host.setdefault(m.group(1), []).append(u)

    rb = {"netloc": [], "robots_txt": []}
    for i, row in enumerate(robots):
        rb["netloc"].append(row["netloc"])
        rb["robots_txt"].append(robots_txt_body(
            row["netloc"], row["crawl_delay_s"],
            row["disallow_prefixes"], style=i))
    pq.write_table(pa.table(rb), rpath)

    sm = {"netloc": [], "url": [], "xml": []}

    def urlset(urls):
        items = "".join(
            f"<url><loc>{u.replace('&', '&amp;')}</loc>"
            f"<lastmod>2021-05-{(k % 28) + 1:02d}</lastmod></url>"
            for k, u in enumerate(urls)
        )
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                + items + "</urlset>")

    hosts = sorted(h for h in by_host if h in {r["netloc"] for r in robots})
    for hi, host in enumerate(hosts):
        # plant disallowed paths so the downstream robots_filter leg has
        # real work (the tier's organic URLs never hit /intern|/admin)
        urls = sorted(by_host[host])[:150] + [
            f"https://{host}/intern/secret{hi}",
            f"https://{host}/admin/panel{hi}",
        ]
        base = f"https://{host}/sitemap.xml"
        if hi == 0 and len(urls) >= 4:  # two-level index for the first host
            half = len(urls) // 2
            subs = [f"https://{host}/sitemap-{j}.xml" for j in (1, 2)]
            idx = ('<sitemapindex '
                   'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                   + "".join(f"<sitemap><loc>{s}</loc></sitemap>"
                             for s in subs)
                   + "</sitemapindex>")
            sm["netloc"].append(host)
            sm["url"].append(base)
            sm["xml"].append(idx)
            for s, chunk in zip(subs, (urls[:half], urls[half:])):
                sm["netloc"].append(host)
                sm["url"].append(s)
                sm["xml"].append(urlset(chunk))
        else:
            sm["netloc"].append(host)
            sm["url"].append(base)
            sm["xml"].append(urlset(urls))
    pq.write_table(pa.table(sm), spath)
    with open(vpath, "w") as f:
        f.write(str(_DISCOVERY_V))


_IMAGES_V = 2  # bump to regenerate images.parquet without touching the tier


def _write_images(fix_dir: str) -> None:
    """Plant REAL decodable images (BMP + PPM + PNG) plus opaque non-image
    payloads in the fixture, with the true dims recorded alongside, so the
    multimodal decode path is verified against ground truth
    (tests/test_multimodal.py)."""
    path = os.path.join(fix_dir, "images.parquet")
    vpath = os.path.join(fix_dir, "_images.v")
    if os.path.exists(path):
        try:
            with open(vpath) as f:
                if f.read().strip() == str(_IMAGES_V):
                    return
        except OSError:
            pass  # no version marker: pre-v2 file, regenerate
    rng = random.Random(SEED + 31)
    urls, blobs, kinds, ws, hs, cs = [], [], [], [], [], []

    def add(kind, blob, w, h, c):
        urls.append(f"https://img.immorobo.de/{kind}/{len(urls)}")
        blobs.append(blob)
        kinds.append(kind)
        ws.append(w)
        hs.append(h)
        cs.append(c)

    for i in range(8):
        w, h = rng.randrange(5, 200), rng.randrange(5, 200)
        add("bmp", bmp_bytes(w, h, rng), w, h, 3)
    for i in range(8):
        w, h = rng.randrange(5, 200), rng.randrange(5, 200)
        add("ppm", ppm_bytes(w, h, rng), w, h, 3)
    for i, ch in enumerate((1, 3, 4, 1, 3, 4, 3, 3)):
        w, h = rng.randrange(5, 200), rng.randrange(5, 200)
        add("png", png_bytes(w, h, rng, channels=ch), w, h, ch)
    for i in range(8):
        # opaque payloads (no decodable header) — the md5-fake path
        add("opaque", bytes(rng.randrange(256) for _ in range(rng.randrange(64, 512))),
            -1, -1, -1)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "img": pa.array(blobs, pa.binary()),
                "kind": pa.array(kinds, pa.string()),
                "true_width": pa.array(ws, pa.int32()),
                "true_height": pa.array(hs, pa.int32()),
                "true_channels": pa.array(cs, pa.int32()),
            }
        ),
        path,
    )
    with open(vpath, "w") as f:
        f.write(str(_IMAGES_V))


def _write_expected(fix_dir: str) -> None:
    """Run the golden simulator over the just-written tiny fixture and
    persist its expected listings/alerts (shaped like CrawlEngine.items_df)
    so the crawl-derived queries get plain read_parquet DuckDB oracles.
    Cheap (~1s: ~1.7k fetches / ~1.2k items) and only done for the tiny
    tier — the tier the crawl queries run on."""
    lpath = os.path.join(fix_dir, "expected_listings.parquet")
    apath = os.path.join(fix_dir, "expected_alerts.parquet")
    if os.path.exists(lpath) and os.path.exists(apath):
        return
    from ..plans.simulator import expected_tables, simulate

    pages = pq.read_table(os.path.join(fix_dir, "pages.parquet"))
    pages_map = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    seeds = pq.read_table(os.path.join(fix_dir, "seeds.parquet")).to_pylist()
    stadte = pq.read_table(os.path.join(fix_dir, "stadte.parquet")).to_pylist()
    # hour=7 — the same deterministic run parameters the engine-side
    # queries use (__spark_entry__._tiny_crawl)
    res = simulate(pages_map, seeds, stadte, hour=7)
    listings, alerts = expected_tables(res)
    pq.write_table(
        pa.table(
            {
                "seed_id": pa.array([r["seed_id"] for r in listings], pa.string()),
                "url": pa.array([r["url"] for r in listings], pa.string()),
                "item_json": pa.array(
                    [r["item_json"] for r in listings], pa.string()
                ),
                "doc_json": pa.array([r["doc_json"] for r in listings], pa.string()),
            }
        ),
        lpath,
    )
    pq.write_table(
        pa.table(
            {
                "seed_id": pa.array([r["seed_id"] for r in alerts], pa.string()),
                "url": pa.array([r["url"] for r in alerts], pa.string()),
                "alert": pa.array([r["alert"] for r in alerts], pa.string()),
            }
        ),
        apath,
    )


def fixture_dir(tier: str, root: str = None) -> str:
    root = root or os.environ.get(
        "SPARK_GRAFT_FIXDIR", "/root/repo/fixtures"
    )
    out = os.path.join(root, tier)
    return generate(tier, out)
