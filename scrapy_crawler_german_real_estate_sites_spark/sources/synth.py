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
# driver
# ---------------------------------------------------------------------------

PORTAL_GENERATORS = {"immonet": _gen_immonet_city}


def make_cities(n):
    rng = random.Random(SEED * 7 + 1)
    cities = []
    for i in range(n):
        base = _CITY_BASE[i] if i < len(_CITY_BASE) else f"Synthstadt{i:04d}"
        nv = rng.randint(4, 12)
        viertel = rng.sample(_VIERTEL_POOL, min(nv, len(_VIERTEL_POOL)))
        cities.append({"id": 400 + i, "stadt": base, "stadtviertel": viertel})
    return cities


def generate(tier: str, out_dir: str, portals=None, force=False) -> str:
    """Generate fixture tables for a tier into ``out_dir``; cached."""
    cfg = TIERS[tier]
    portals = portals or list(PORTAL_GENERATORS)
    manifest = {
        "tier": tier,
        "seed": SEED,
        "cities": cfg["cities"],
        "portals": sorted(portals),
        "v": 1,
    }
    mpath = os.path.join(out_dir, "_manifest.json")
    if not force and os.path.exists(mpath):
        with open(mpath) as f:
            if json.load(f) == manifest:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    cities = make_cities(cfg["cities"])
    sink = PageSink()
    seeds = []
    sid = 0
    for city in cities:
        for haus, kaufen in COMBOS:
            for portal in portals:
                rng = random.Random(f"{SEED}|{city['id']}|{haus}|{kaufen}|{portal}")
                gen = PORTAL_GENERATORS[portal]
                seeds.append(gen(rng, sink, city, haus, kaufen, f"seed{sid:05d}"))
                sid += 1

    # a few non-German distractor pages (lang filter exercise)
    rng = random.Random(SEED + 99)
    for i in range(max(5, cfg["cities"] // 3)):
        sink.add(
            f"https://example.org/en/{i}",
            f"<html><body><p>english page {i} {rng.random()}</p></body></html>",
            lang="en",
        )

    pq.write_table(sink.table(), os.path.join(out_dir, "pages.parquet"))

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

    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return out_dir


def fixture_dir(tier: str, root: str = None) -> str:
    root = root or os.environ.get(
        "SPARK_GRAFT_FIXDIR", "/root/repo/fixtures"
    )
    out = os.path.join(root, tier)
    return generate(tier, out)
