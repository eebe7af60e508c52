"""Shared portal-parser contracts.

A portal module re-expresses one reference spider (SURVEY.md §2.2/§2.5) as a
pure function ``parse(kind, body, url, meta, ctx) -> ParseResult`` over the
mini-DOM — no I/O, no globals — so the exact same extraction code runs

* row-at-a-time inside the offline reference-semantics simulator
  (``plans/simulator.py``, the golden oracle), and
* batched inside the engine's Arrow ``mapInPandas`` dispatcher
  (``operators/parse_batch.py``).

The *crawl mechanics* around it (FIFO vs frontier iterations, seen-set
anti-join vs per-URL RPC, budgets/streaks) differ between the two — that is
precisely what the byte-identity and ordering tests pin down.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import urljoin


@dataclass
class SeedCtx:
    """Per-seed crawl context (reference: the ``stadturls`` doc plus the
    spider's constructor state — e.g. ``immonet.py:47-64``)."""

    seed_id: str
    portal: str
    stadtid: int
    stadtname: str
    haus: int  # 0=wohnung 1=haus 2=wg (pipelines.py:382-385)
    kaufen: int  # 0=mieten 1=kaufen (pipelines.py:175-178)
    url: str
    chatid: Optional[str] = None
    hour: int = 7  # run hour — drives P9 start-page heuristic, passed
    #                explicitly for determinism (immonet.py:310-321)
    run_date: datetime.date = datetime.date(2021, 5, 1)
    # district array of this city, position = district id (database.py:68-86)
    stadtviertel: tuple = ()
    # D7 epoch (immowelt.py:44-51): the spider instance's progressCounter,
    # set at construction by the deployment; detail responses whose request
    # meta carries a DIFFERENT counter are late arrivals from a previous
    # instance and their items are dropped (immowelt.py:200-204)
    progress_counter: int = 0

    def viertel_index(self, viertel: str):
        """J2: $indexOfArray over stadte.Stadtviertel (database.py:70-86).
        Returns 0-based index, or None when absent / index<0."""
        try:
            idx = self.stadtviertel.index(viertel)
        except ValueError:
            return None
        return idx if idx >= 0 else None


@dataclass
class Link:
    url: str
    kind: str  # 'start' | 'listing' | 'detail' | 'detail2'
    seq: int  # in-page document-order index (ordering contract A6)
    meta: dict = field(default_factory=dict)
    dup_check: bool = True  # False → bypasses the URL-seen anti-join
    #                         (pagination links are never dup-checked)


@dataclass
class ParseResult:
    links: list = field(default_factory=list)
    item: Optional[dict] = None  # single extracted item (most portals)
    item_kind: Optional[str] = None  # 'immo' | 'wg'
    items: list = field(default_factory=list)  # [(item, kind)] — pages that
    #   yield MANY items inline (sparkasse.py:58-169) append here
    stop_seed: bool = False  # spider closed itself (CloseSpider)

    def __post_init__(self):
        if self.item is not None:
            self.items.append((self.item, self.item_kind or "immo"))


def join_url(base: str, href: str) -> str:
    """``response.urljoin`` equivalent (stdlib urljoin, as Scrapy uses)."""
    return urljoin(base, href)


PORTAL_REGISTRY = {}


def register(module_name: str, parse_fn):
    PORTAL_REGISTRY[module_name] = parse_fn
