"""robots.txt parsing — raw fetched robots bodies → the engine's robots
table (netloc, crawl_delay_s, max_concurrent, disallow_prefixes, …).

The reference delegates this to Scrapy's robots middleware
(``ROBOTSTXT_OBEY`` consumers; the engine's politeness inputs assumed a
pre-built robots table).  This closes the loop: fetch each host's
``/robots.txt`` like any page, parse it HERE, and feed
``operators/politeness.py:robots_filter`` / ``tag_batch`` directly.

Grammar per **RFC 9309** (Robots Exclusion Protocol) with the de-facto
extensions every major crawler honors:

* groups = consecutive ``User-agent`` lines followed by rules; a rule
  line belongs to the nearest preceding group (RFC 9309 §2.2.1);
* agent match is case-insensitive on the product token; the MOST
  SPECIFIC match wins — exact token beats token-prefix beats ``*`` —
  and the rules of ALL groups sharing that winning specificity are
  MERGED in document order (RFC 9309 §2.2.1: "If more than one group
  matches, the matching groups' rules MUST be combined" — e.g. two
  separate ``User-agent: *`` groups, a common real-world pattern);
* ``Disallow:`` with an empty value = allow-all (not a rule);
* ``Allow`` lines are collected separately (the engine's prefix filter
  is disallow-only; allow is exposed for longest-match consumers);
* ``Crawl-delay`` (non-RFC, honored by Bing/Yandex/Scrapy's scheduler)
  parses as float seconds;
* ``Sitemap:`` lines are GLOBAL (outside groups, RFC 9309 §2.3) and
  feed :mod:`.sitemaps`;
* comments (``#`` to EOL), BOM, CR/LF, and blank-line tolerance.

Scale shape: parsing is row-local (one robots body per host) inside one
Arrow ``mapInPandas`` pass — no shuffle, output is O(hosts), and the
result broadcast-joins into the politeness select exactly like the
fixture table it replaces.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_SCHEMA = (
    "netloc string, crawl_delay_s double, max_concurrent int, "
    "disallow_prefixes array<string>, allow_prefixes array<string>, "
    "sitemaps array<string>"
)


def parse_robots_text(body: str, user_agent: str = "*") -> dict:
    """Parse ONE robots.txt body for ``user_agent``.

    Returns {crawl_delay_s, disallow_prefixes, allow_prefixes, sitemaps}
    merged across ALL groups at the most specific matching level (exact
    agent token > token-prefix > '*', RFC 9309 §2.2.1: matching groups'
    rules MUST be combined); hosts without a matching group get empty
    rules (allow-all)."""
    ua = user_agent.lower()
    groups: list[dict] = []  # {agents: [..], dis: [..], alw: [..], delay}
    cur: Optional[dict] = None
    agents_open = False  # consecutive UA lines extend the same group
    sitemaps: list[str] = []
    for raw in body.replace("﻿", "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)  # global, group-independent
            continue
        if key == "user-agent":
            if not agents_open:
                cur = {"agents": [], "dis": [], "alw": [], "delay": None}
                groups.append(cur)
                agents_open = True
            cur["agents"].append(val.lower())
            continue
        agents_open = False
        if cur is None:
            continue  # rule before any User-agent line: ignored
        if key == "disallow":
            if val:  # empty Disallow = allow-all, not a rule
                cur["dis"].append(val)
        elif key == "allow":
            if val:
                cur["alw"].append(val)
        elif key == "crawl-delay":
            try:
                cur["delay"] = float(val)
            except ValueError:
                pass

    def specificity(g) -> int:
        # exact token > token-prefix (robots agent value is a prefix of
        # our product token, the Googlebot-parser rule) > '*'
        best = -1
        for a in g["agents"]:
            if a == ua:
                s = 3
            elif a != "*" and ua.startswith(a):
                s = 2
            elif a == "*":
                s = 1
            else:
                s = -1
            best = max(best, s)
        return best

    best_s = 0
    for g in groups:
        best_s = max(best_s, specificity(g))
    if best_s == 0:
        return {"crawl_delay_s": None, "disallow_prefixes": [],
                "allow_prefixes": [], "sitemaps": sitemaps}
    # RFC 9309 §2.2.1: every group at the winning specificity contributes;
    # merge rules in document order. Crawl-delay: first non-None wins.
    dis: list[str] = []
    alw: list[str] = []
    delay = None
    for g in groups:
        if specificity(g) == best_s:
            dis.extend(g["dis"])
            alw.extend(g["alw"])
            if delay is None:
                delay = g["delay"]
    return {
        "crawl_delay_s": delay,
        "disallow_prefixes": dis,
        "allow_prefixes": alw,
        "sitemaps": sitemaps,
    }


def parse_robots(df: DataFrame, user_agent: str = "*",
                 default_delay: float = 10.0,
                 default_concurrent: int = 1,
                 netloc_col: str = "netloc",
                 body_col: str = "robots_txt") -> DataFrame:
    """(netloc, robots_txt) rows → the engine's robots table.

    Hosts whose body is NULL/empty (no robots.txt served) get the
    defaults with no disallows — the reference's effective behavior.
    Row-local Arrow batches; output is O(hosts) and broadcast-joins into
    ``politeness.tag_batch`` unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"netloc": [], "crawl_delay_s": [], "max_concurrent": [],
                   "disallow_prefixes": [], "allow_prefixes": [],
                   "sitemaps": []}
            for netloc, body in zip(pdf[netloc_col], pdf[body_col]):
                p = parse_robots_text(body or "", user_agent)
                out["netloc"].append(netloc)
                out["crawl_delay_s"].append(
                    p["crawl_delay_s"] if p["crawl_delay_s"] is not None
                    else default_delay)
                out["max_concurrent"].append(default_concurrent)
                out["disallow_prefixes"].append(p["disallow_prefixes"])
                out["allow_prefixes"].append(p["allow_prefixes"])
                out["sitemaps"].append(p["sitemaps"])
            yield pd.DataFrame(out)

    return df.select(netloc_col, body_col).mapInPandas(run, ROBOTS_SCHEMA)
