"""Spider-trap triage over the URL frontier.

Crawl traps — calendar pages, session-id query explosions, recursive
path loops — are the classic way a frontier silently fills with one
host's garbage (Heydon & Najork, Mercator, WWW 1999 describe all
three).  The reference crawler never needed this because its spiders
enumerate a fixed set of portals, but a Common-Crawl-style frontier at
10^10 URLs does: trap triage runs *before* politeness budgeting so a
trapped host's budget collapses to its real content.

Every feature below is a narrow per-row column expression (no UDF, no
shuffle); the only exchange is the final per-host rollup, whose width
is the number of hosts.  The same features double as frontier-priority
penalties.

Heuristics (each independently CASE/regex-expressible so the DuckDB
oracle replays them exactly):

* ``depth``      — path-segment count; > ``max_depth`` is suspect.
* ``dup_segs``   — repeated path segments (``/a/b/a/``): any segment
                   appearing twice is the loop signature.
* ``n_params``   — query-parameter count; > ``max_params`` smells like
                   a session-id / faceted-search explosion.
* ``calendar``   — ``/YYYY/M(/...)`` date paths, the infinite-calendar
                   trap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import host_col

_CAL_RE = r"/(19|20)[0-9]{2}/[0-9]{1,2}(/|$)"


def url_trap_features(
    url_col: str = "url",
    max_depth: int = 6,
    max_params: int = 5,
) -> dict[str, Column]:
    """Per-URL trap feature columns, all engine-portable expressions."""
    url = F.col(url_col)
    path = F.regexp_extract(url, r"^https?://[^/]+([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    dup_segs = depth - F.size(F.array_distinct(segs))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, "&", "")) + 1
    )
    calendar = F.regexp_extract(path, _CAL_RE, 0) != ""
    suspect = (
        (depth > max_depth)
        | (dup_segs >= 2)
        | (n_params > max_params)
        | calendar
    )
    return {
        "depth": depth.cast("int"),
        "dup_segs": dup_segs.cast("int"),
        "n_params": n_params.cast("int"),
        "calendar": calendar,
        "trap_suspect": suspect,
    }


def trap_report(
    pages: DataFrame,
    url_col: str = "url",
    max_depth: int = 6,
    max_params: int = 5,
) -> DataFrame:
    """Per-host trap triage: how much of each host's frontier slice
    looks like a trap, and which trap.  Output columns
    (host, n_urls, n_suspect, suspect_share, n_deep, n_loops,
    n_param_explosion, n_calendar, max_depth, max_params).

    One map-side-combinable aggregation: conditional-sum partials merge
    by addition, so the shuffle carries hosts, not URLs — the property
    that keeps this free at frontier scale.
    """
    f = url_trap_features(url_col, max_depth=max_depth, max_params=max_params)
    base = pages.select(
        host_col(url_col).alias("host"),
        *[c.alias(n) for n, c in f.items()],
    )
    n = F.count("*")
    susp = F.sum(F.col("trap_suspect").cast("int"))
    return base.groupBy("host").agg(
        n.cast("bigint").alias("n_urls"),
        susp.cast("bigint").alias("n_suspect"),
        F.round(susp / n, 4).alias("suspect_share"),
        F.sum((F.col("depth") > max_depth).cast("int"))
        .cast("bigint")
        .alias("n_deep"),
        F.sum((F.col("dup_segs") >= 2).cast("int"))
        .cast("bigint")
        .alias("n_loops"),
        F.sum((F.col("n_params") > max_params).cast("int"))
        .cast("bigint")
        .alias("n_param_explosion"),
        F.sum(F.col("calendar").cast("int")).cast("bigint").alias("n_calendar"),
        F.max("depth").cast("int").alias("max_depth"),
        F.max("n_params").cast("int").alias("max_params"),
    )
