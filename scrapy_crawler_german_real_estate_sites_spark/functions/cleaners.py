"""Scalar field processors — exact re-implementations of the reference's
item-processor semantics (reference ``demo_crawl/items.py:12-137``,
SURVEY.md §2.6 C1–C18), plus the Scrapy ItemLoader/MapCompose/TakeFirst
accumulation machinery they run inside.

babel is unavailable here, so ``parse_decimal`` is re-implemented with the
documented babel non-strict semantics (strip locale group separator, swap
locale decimal separator for '.', feed ``decimal.Decimal``): 'de' uses
'.'-grouping/','-decimal, 'en' the reverse.  Quirks preserved on purpose
(they gate the byte-identity invariant, BASELINE.json:input_hint):

* ``parseToNumber`` returns its INPUT unchanged on any failure
  (items.py:50-52) — downstream fields may therefore hold strings.
* ``parsetoDateTime`` maps digit-less values ("sofort") to the RUN DATE —
  threaded through ``run_date`` for determinism (items.py:113-115).
* ``booleanconverter`` maps presence → 1 ("Terrasse" → 1) and only the
  literal strings "NULL"/"0" → 0 (items.py:76-80).
* MapCompose drops ``None`` results; TakeFirst skips ``None`` and ``''``.

These run row-at-a-time *inside* Arrow-batched pandas UDFs (the DOM parse
dominates; string cleanup is noise) — no driver-side per-row Python.
"""

from __future__ import annotations

import datetime
import re
from decimal import Decimal, InvalidOperation


# ---------------------------------------------------------------------------
# babel.numbers.parse_decimal replacement (public babel semantics)
# ---------------------------------------------------------------------------

_LOCALE_SEPS = {"de": (".", ","), "en": (",", ".")}


class NumberFormatError(ValueError):
    pass


def parse_decimal(string, locale="en"):
    group, dec = _LOCALE_SEPS[locale]
    s = str(string).strip()
    try:
        return Decimal(s.replace(group, "").replace(dec, "."))
    except InvalidOperation:
        raise NumberFormatError(f"{string!r} is not a valid decimal number")


# ---------------------------------------------------------------------------
# C1–C5: string cleanup (items.py:12-36; w3lib remove_tags)
# ---------------------------------------------------------------------------

def remove_whitespace(value):
    # items.py:12-17 — strip; drop Euro sign and m² unit
    try:
        return value.strip().replace("€", "").replace("m²", "")
    except Exception:
        return value


def remove_whitespacewg(value):
    # items.py:20-27
    try:
        return (
            value.strip()
            .replace("[", "")
            .replace("]", "")
            .replace("„", "")
            .replace("\xa093053", "")
            .replace("\n", "")
            .replace("\xa0", "")
            .replace("\t", "")
            .replace(",", "")
        )
    except Exception:
        return value


def remove_dot(value):
    # items.py:30-31 (raises on non-str, like the reference)
    return value.strip().replace("[", "").replace("]", "")


_BACKSLASH_RE = re.compile(r"[\n\r\t]")


def remove_backslash(value):
    # items.py:33-36
    return _BACKSLASH_RE.sub(" ", value).strip()


_TAG_RE = re.compile(r"<[^<>]*>")


def remove_tags(value):
    # w3lib.html.remove_tags: accepts bytes (decodes utf-8), strips tags.
    if isinstance(value, bytes):
        value = value.decode("utf-8")
    return _TAG_RE.sub("", value)


# ---------------------------------------------------------------------------
# C6–C8: German-locale numeric parsers (items.py:38-74)
# ---------------------------------------------------------------------------

_NUM_SEARCH_RE = re.compile(r"\b\d[\d,.]*\b")
_WGNUM_RE = re.compile(r"\d+(?:[.,]\d*)?")
_DIGITS_RE = re.compile(r"\d+")


def parse_to_number(value):
    # items.py:38-52 — returns the CURRENT binding of `value` on failure:
    # original input if the regex found nothing, the matched substring if
    # Decimal parsing failed after a successful match.
    if not value:
        return None
    try:
        value = _NUM_SEARCH_RE.search(str(value)).group(0)
        parsed = parse_decimal(str(value), locale="de")
        if "." in str(parsed):
            parsed = str(parsed).split(".")[0]
        return int(parsed)
    except Exception:
        return value


def parse_to_wg_number(value):
    # items.py:54-65
    if not value:
        return None
    try:
        value = _WGNUM_RE.search(str(value)).group(0)
        if "." in str(value):
            value = str(value).split(".")[0]
        return int(value)
    except Exception:
        return value


def parse_zimmer_or_flache(value):
    # items.py:67-74
    try:
        return int(_DIGITS_RE.search(str(value)).group(0))
    except Exception:
        return value


# ---------------------------------------------------------------------------
# C9–C12: boolean converters (items.py:76-102)
# ---------------------------------------------------------------------------

def booleanconverter(value):
    return 0 if str(value) == "NULL" or str(value) == "0" else 1


def booleanwgconverter(value):
    try:
        return 1 if value is True else 0
    except Exception:  # pragma: no cover
        return 0


def haustierconverter(value):
    return 0 if str(value).upper().strip() == "NEIN" else 1


def has_numbers(input_string):
    return any(ch.isdigit() for ch in input_string)


# ---------------------------------------------------------------------------
# C13: German date parsing (items.py:105-137) — run_date injected
# ---------------------------------------------------------------------------

_ALPHA_RE = re.compile(r"[a-zA-Z]")
_NONDATE_RE = re.compile(r"[^0-9.]")
_SLASH_RE = re.compile(r"\/.*\.")

_DATE_FORMATS = ("%d.%m.%y", "%d.%m.%Y", "%d.%m.%Y.", "%d.%m.%y.")


def parse_to_datetime(value, run_date: datetime.date):
    """items.py:105-137 with the process-time 'today' made explicit.

    The reference calls ``datetime.datetime.now()`` (items.py:115); we take
    ``run_date`` as a parameter so runs are reproducible (SURVEY.md §7.3a).
    """
    if not value:
        return None
    try:
        if not has_numbers(value):
            return run_date.strftime("%Y-%m-%d")
        value = _ALPHA_RE.sub("", value).strip()
        if "/" in value:
            _ = _SLASH_RE.sub("", value)  # reference computes, then discards
        match = _NONDATE_RE.sub("", value)
        for fmt in _DATE_FORMATS:
            try:
                value = datetime.datetime.strptime(match, fmt).strftime("%Y-%m-%d")
                break
            except Exception:
                pass
        return str(value).strip()
    except Exception:
        return None


# ---------------------------------------------------------------------------
# C15: immonet en→de decimal fallback (immonet.py:175-236)
# ---------------------------------------------------------------------------

def parse_price_en_de(raw):
    """Extract first number token and parse as en-locale, falling back to
    de-locale on error; ``int(round(...))`` like immonet.py:180-189.
    Returns None when no token is found (reference leaves field unset)."""
    if raw is None:
        return None
    m = _WGNUM_RE.search(str(raw))
    if not m:
        return None
    tok = m.group(0)
    try:
        return int(round(parse_decimal(tok, locale="en")))
    except Exception:
        return int(round(parse_decimal(tok, locale="de")))


# ---------------------------------------------------------------------------
# C17/C18: pipeline-side guards (pipelines.py:57-64,172-174)
# ---------------------------------------------------------------------------

_VALID_ADDR_RE = re.compile(r"[a-zA-Z]+\s\d{1,3}")


def valid_adresse(addr):
    if addr is None:
        return False
    return bool(_VALID_ADDR_RE.search(str(addr).replace(".", "")))


def strasse_guard(s):
    return "" if s is not None and len(str(s)) > 100 else s


# ---------------------------------------------------------------------------
# Scrapy loader machinery: MapCompose / TakeFirst / ItemLoader
# (public Scrapy semantics; accumulation per field, None dropped, first
#  non-None/non-'' wins)
# ---------------------------------------------------------------------------

def _arg_to_iter(v):
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v]


class MapCompose:
    def __init__(self, *functions):
        self.functions = functions

    def __call__(self, value):
        values = _arg_to_iter(value)
        for func in self.functions:
            nxt = []
            for v in values:
                nxt.extend(_arg_to_iter(func(v)))
            values = nxt
        return values


def take_first(values):
    for v in values:
        if v is not None and v != "":
            return v
    return None


# Per-field input processors, mirroring items.py:140-264.  ``bezugsfreiab``
# needs run_date, bound at loader construction.
def immobilie_processors(run_date):
    date_proc = lambda v: parse_to_datetime(v, run_date)
    return {
        "title": MapCompose(remove_tags, remove_dot),
        "kaltmiete": MapCompose(remove_whitespace, parse_to_number),
        "nebenkosten": MapCompose(remove_whitespace, parse_to_number),
        "gesamtkosten": MapCompose(remove_whitespace, parse_to_number),
        "zimmer": MapCompose(remove_whitespace, parse_zimmer_or_flache),
        "flache": MapCompose(remove_whitespace, parse_zimmer_or_flache),
        "grundstuck": MapCompose(remove_whitespace, parse_zimmer_or_flache),
        "anbieter": MapCompose(remove_whitespace),
        "typ": MapCompose(remove_whitespace),
        "bezugsfreiab": MapCompose(date_proc),
        "provisionsfrei": MapCompose(booleanconverter, remove_whitespace),
        "haustier": MapCompose(haustierconverter, remove_whitespace),
        "garage": MapCompose(booleanconverter, remove_whitespace),
        "terrasse": MapCompose(booleanconverter, remove_whitespace),
        "keller": MapCompose(booleanconverter, remove_whitespace),
        "garten": MapCompose(booleanconverter, remove_whitespace),
        "balkon": MapCompose(booleanconverter, remove_whitespace),
        "ebk": MapCompose(booleanconverter, remove_whitespace),
        "aufzug": MapCompose(booleanconverter, remove_whitespace),
        "mobliert": MapCompose(booleanconverter, remove_whitespace),
        "barriefrei": MapCompose(booleanconverter, remove_whitespace),
        "ort": MapCompose(remove_tags, remove_whitespace),
        "kaufen": MapCompose(booleanconverter, remove_whitespace),
        "haus": MapCompose(booleanconverter, remove_whitespace),
        "wg": MapCompose(booleanconverter, remove_whitespace),
        "url": MapCompose(remove_tags),
        "adresse": MapCompose(remove_tags, remove_whitespacewg),
        "stadtid": MapCompose(remove_whitespace),
        "stadtvid": MapCompose(remove_whitespace),
        "stadtname": MapCompose(remove_whitespace),
        "moebliert": MapCompose(booleanwgconverter, remove_whitespace),
    }


def wg_processors(run_date):
    return {
        "title": MapCompose(remove_whitespacewg),
        "gesamtkosten": MapCompose(remove_whitespace, parse_to_wg_number),
        "gesamtflache": MapCompose(remove_whitespace, parse_to_wg_number),
        "zimmerflache": MapCompose(remove_whitespace, parse_to_wg_number),
        "anbieter": MapCompose(remove_whitespace),
        "haus": MapCompose(remove_whitespace, parse_to_wg_number),
        "anzahlf": MapCompose(remove_whitespace),
        "anzahlm": MapCompose(remove_whitespace),
        "gesuchtf": MapCompose(remove_whitespace),
        "gesuchtm": MapCompose(remove_whitespace),
        "garten": MapCompose(booleanwgconverter, remove_whitespace),
        "garage": MapCompose(booleanwgconverter, remove_whitespace),
        "keller": MapCompose(booleanwgconverter, remove_whitespace),
        "balkon": MapCompose(booleanwgconverter, remove_whitespace),
        "kaution": MapCompose(remove_whitespace, parse_to_wg_number),
        "aufzug": MapCompose(booleanwgconverter, remove_whitespace),
        "moebliert": MapCompose(booleanwgconverter, remove_whitespace),
        "haustier": MapCompose(haustierconverter, remove_whitespace),
        "barriefrei": MapCompose(booleanwgconverter, remove_whitespace),
        "adresse": MapCompose(remove_whitespacewg),
        "stadtid": MapCompose(remove_whitespace),
        "stadtvid": MapCompose(remove_whitespacewg),
    }


# Fields with no processors: values pass through unchanged, TakeFirst only
# (Scrapy default Identity input + our explicit TakeFirst wiring is per
# field; fields like images/lat/lon/createdat are assigned directly).
_RAW_FIELDS = {"images", "lat", "lon", "createdat", "alive", "chatid",
               "bezugsfreiab_wg", "wgsize", "wgwomenonly"}


# Declared fields (items.py:140-264).  Scrapy Items raise KeyError when an
# undeclared field is set at load_item — the sparkasse spider relies on this
# (its 'bildN' adds abort parsing, sparkasse.py:145-169).
IMMOBILIE_FIELDS = frozenset(
    "title kaltmiete nebenkosten gesamtkosten zimmer flache grundstuck "
    "anbieter typ bezugsfreiab provisionsfrei haustier garage terrasse "
    "keller garten balkon ebk aufzug mobliert images barriefrei ort kaufen "
    "haus wg url adresse stadtid stadtvid lat chatid lon createdat alive "
    "stadtname moebliert".split()
)
WG_FIELDS = frozenset(
    "title gesamtkosten gesamtflache zimmerflache anbieter haus bezugsfreiab "
    "wgsize anzahlf anzahlm gesuchtf gesuchtm wgwomenonly garten garage "
    "keller balkon kaution aufzug moebliert haustier lat lon barriefrei "
    "adresse url images createdat stadtid stadtvid".split()
)


class ItemLoader:
    """Minimal faithful ItemLoader: accumulate per field, apply input
    processor per add, output processor (TakeFirst) at load_item.
    Direct ``item[f] = v`` assignments bypass processors, exactly like
    Scrapy Items (used for prices at immonet.py:183 etc.)."""

    def __init__(self, item, selector, processors, fields=IMMOBILIE_FIELDS):
        self.item = item  # plain dict
        self.selector = selector  # XDoc
        self.processors = processors
        self.fields = fields
        self._values = {}

    def add_value(self, field, value):
        proc = self.processors.get(field)
        vals = proc(value) if proc else _arg_to_iter(value)
        self._values.setdefault(field, []).extend(vals)

    def add_xpath(self, field, xpath):
        got = self.selector.xpath(xpath).getall()
        self.add_value(field, got)

    def load_item(self):
        # Scrapy order: compute output first; None outputs are skipped
        # entirely (so an EMPTY undeclared field like immowelt's bildN with
        # no matches does NOT raise — immowelt.py:218-236), while a
        # non-None undeclared field raises KeyError (sparkasse.py:145-169).
        for field, vals in self._values.items():
            out = take_first(vals)
            if out is None:
                continue
            if field not in self.fields:
                raise KeyError(f"item does not support field: {field}")
            self.item[field] = out
        return self.item
