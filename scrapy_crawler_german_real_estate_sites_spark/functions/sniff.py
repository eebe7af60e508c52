"""Content-type sniffing — magic-byte MIME detection for binary columns.

A crawl at archive scale cannot trust `Content-Type` headers (wrong or
absent on a large fraction of real responses — which is why WHATWG
standardized browser sniffing); the multimodal router
(``operators/multimodal.py``) and the parse dispatch both need the
payload's REAL family.  This is the WHATWG-MIME-sniffing core table
(the deterministic magic-byte subset — no heuristic text scoring),
expressed as a whole-stage-codegen chain over the hex of the payload's
first bytes: zero Python, prunes to an 18-byte prefix read when the
source supports it, and DuckDB-mirrorable (query ``content_sniff``).

Magic numbers (public, per the WHATWG MIME Sniffing spec §6.1 + IANA
registrations): PNG, JPEG, GIF, BMP, WEBP (RIFF....WEBP), PDF, gzip,
zip, PNM (P5/P6), WARC, and tag-sniffed HTML/XML as the text fallback.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex-prefix-upper, mime) — longest/most-specific first.  RIFF/WEBP
# needs bytes 0-3 + 8-11, handled separately.
_MAGIC = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("424D", "image/bmp"),
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("50350A", "image/x-portable-graymap"),   # P5\n
    ("50360A", "image/x-portable-pixmap"),    # P6\n
    ("574152432F", "application/warc"),       # WARC/
]


# Tag-sniffed text types, matched on the raw hex so neither engine ever
# decodes arbitrary bytes (DuckDB's blob→varchar cast rejects invalid
# UTF-8; Spark would silently substitute).  The conventional spellings:
_TAG_MAGIC = [
    ("3C21444F4354595045", "text/html"),   # <!DOCTYPE
    ("3C21646F6374797065", "text/html"),   # <!doctype
    ("3C68746D6C", "text/html"),           # <html
    ("3C48544D4C", "text/html"),           # <HTML
    ("3C3F786D6C", "text/xml"),            # <?xml
]


def sniff_mime(col: Column) -> Column:
    """Binary column → MIME string (``application/octet-stream`` when no
    magic matches)."""
    hx = F.upper(F.hex(F.substring(col, 1, 18)))
    riff = hx.startswith("52494646") & (F.substring(hx, 17, 8) == "57454250")
    expr = F.when(riff, "image/webp")
    for magic, mime in _MAGIC + _TAG_MAGIC:
        expr = expr.when(hx.startswith(magic.upper()), mime)
    return expr.otherwise("application/octet-stream")


def sql_sniff_mime(expr: str) -> str:
    """The identical decision chain as a DuckDB expression.  DuckDB has
    no BLOB substring, so the slice happens on the hex string (36 hex
    chars = the same 18-byte prefix the Spark side reads)."""
    hx = f"substring(upper(hex({expr})), 1, 36)"
    cases = [
        f"WHEN {hx} LIKE '52494646%' AND substring({hx}, 17, 8) = "
        "'57454250' THEN 'image/webp'"
    ]
    for magic, mime in _MAGIC + _TAG_MAGIC:
        cases.append(f"WHEN {hx} LIKE '{magic.upper()}%' THEN '{mime}'")
    return ("CASE " + " ".join(cases)
            + " ELSE 'application/octet-stream' END")
