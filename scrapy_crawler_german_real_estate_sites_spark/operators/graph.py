"""Link-graph analytics over the north-rule pages table.

The reference crawler's frontier priority is purely structural (depth +
listing-page heuristics, SURVEY §2.2); at Common-Crawl scale the standard
upgrade is link-graph centrality — PageRank over the URL graph extracted
from the fetched HTML — feeding the frontier priority queue, plus
anchor-text aggregation per target URL (the classic web-corpus signal for
both ranking and training data).  This module implements both Spark-first:

* edge extraction is a pure JVM regexp pass (``regexp_extract_all`` on the
  page HTML — no Python in the hot path), restricted to syntax Java regex
  and DuckDB's RE2 interpret identically so the oracle mirrors the
  extraction byte-for-byte;
* PageRank is the standard iterative dataflow (contributions join +
  per-destination sum), with per-iteration ``localCheckpoint`` to truncate
  lineage (same discipline as ``operators/cluster.py``'s connected
  components) and only O(1) scalars (the dangling-rank mass) crossing the
  driver per iteration.

Scale shape (the 10^10-URL question): edges are materialized once and
cached partitioned by ``src``, so the per-iteration ranks⋈edges join
reuses one side's layout; the contribution shuffle keyed by ``dst`` is
inherent to the algorithm and skew-bounded by AQE skew-join splitting
(hub pages — a portal's start page with 10^6 in-links — split across
tasks; the per-dst sum is a partial-aggregatable groupBy, so a hub's
contributions collapse map-side before the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared Java∩RE2 patterns (mirrored verbatim in the DuckDB oracles).
HREF_RE = r'href="([^"]+)"'
ATAG_RE = r'<a [^>]*href="[^"]*"[^>]*>[^<]*</a>'
PREFIX_RE = r"^(https?://[^/]+)"


def resolve_link(base, link):
    """Resolve an href against its page's scheme+host prefix: absolute
    http(s) links pass through, root-relative links concatenate, anything
    else (javascript:, mailto:, protocol-relative, fragments) drops to
    NULL.  Fragments are stripped.  Pure column expression."""
    absolute = link.startswith("http://") | link.startswith("https://")
    resolved = (
        F.when(absolute, link)
        .when(link.startswith("/"), F.concat(base, link))
    )  # otherwise NULL
    return F.regexp_replace(resolved, "#.*$", "")


def extract_edges(pages: DataFrame, url_col="url", html_col="text") -> DataFrame:
    """Distinct (src, dst) URL edges from the pages' HTML hrefs.

    One narrow scan + explode; the only exchange is the ``distinct`` —
    map-side combinable, and a boilerplate link repeated on every page of
    a host collapses per-task before the shuffle."""
    base = F.regexp_extract(F.col(url_col), PREFIX_RE, 1)
    raw = pages.select(
        F.col(url_col).alias("src"),
        base.alias("base"),
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)).alias(
            "link"
        ),
    )
    dst = resolve_link(F.col("base"), F.col("link"))
    return (
        raw.select("src", dst.alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
    )


def pagerank(
    edges: DataFrame, iters: int = 8, damping: float = 0.85
) -> DataFrame:
    """Iterative PageRank over a (src, dst) edge DataFrame.

    Returns (url, rank_mass) for every node (union of srcs and dsts),
    where ``rank_mass = rank * n_nodes`` — the size-free centrality (1.0 =
    the rank a uniform graph would give), which also keeps the values
    O(1) so a 6-decimal comparison is meaningful at any graph size.

    Dangling nodes (no out-edges) redistribute their rank uniformly — the
    standard Page et al. 1999 treatment.  The dangling mass never crosses
    the driver: it is a 1-row aggregate broadcast back into the update, so
    each iteration is ONE Spark action (the ``localCheckpoint``), not a
    collect + an action.  Lineage stays flat via the per-iteration
    checkpoint.
    """
    # Pre-partition the edge list by src ONCE and fold the out-degree in
    # as a partition-local window (edges are already hashed by src, so
    # the window adds a sort but NO exchange and NO second extraction
    # pass) — then cache the weighted edges; everything downstream (node
    # set, dangling flags, every iteration's contribution join) reads
    # this one cache.  Per-iteration the ranks⋈edges join exchanges only
    # the (small) rank table — measured 1.8× end-to-end at sf0.1 vs
    # re-shuffling edges every round, plus one fewer join per iteration
    # vs keeping outdeg separate.
    from pyspark.sql import Window

    edges_w = (
        edges.repartition("src")
        .withColumn(
            "deg", F.count("*").over(Window.partitionBy("src")).cast("double")
        )
        .cache()
    )
    nodes = (
        edges_w.select(F.col("src").alias("url"))
        .union(edges_w.select(F.col("dst").alias("url")))
        .distinct()
        # dangling flag precomputed once: no per-iteration anti-join
        .join(
            edges_w.select(F.col("src").alias("url")).distinct()
            .withColumn("has_out", F.lit(True)),
            "url",
            "left",
        )
        .select("url", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .cache()
    )
    n = nodes.count()  # O(1) driver scalar, also materializes the caches

    base = (1.0 - damping) / n
    ranks = nodes.withColumn("r", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iters):
        # dangling share as a broadcast 1-row aggregate — in-plan, no
        # driver round-trip
        dang = ranks.where(~F.col("has_out")).agg(
            (F.coalesce(F.sum("r"), F.lit(0.0)) / n).alias("dshare")
        )
        contrib = (
            ranks.join(edges_w, ranks["url"] == edges_w["src"])
            .groupBy(F.col("dst").alias("url"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("s"))
        )
        ranks = (
            nodes.join(contrib, "url", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "url",
                "has_out",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dshare"))
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("url", (F.col("r") * F.lit(float(n))).alias("rank_mass"))


def anchor_text(pages: DataFrame, url_col="url", html_col="text") -> DataFrame:
    """Anchor-text aggregation per target URL: for every link target, the
    total in-anchor count, the number of distinct anchor strings, and the
    most frequent anchor (largest count, lexicographically-smallest text
    as the deterministic tie-break).

    Two-level aggregate: the (dst, anchor) groupBy is map-side combinable
    (a hub's million identical "Details" anchors collapse per task), and
    the top-1-per-dst rank filter executes as WindowGroupLimit so the
    second exchange moves O(dst) rows."""
    from pyspark.sql import Window

    base = F.regexp_extract(F.col(url_col), PREFIX_RE, 1)
    tags = pages.select(
        base.alias("base"),
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(ATAG_RE), 0)).alias(
            "tag"
        ),
    )
    link = F.regexp_extract(F.col("tag"), HREF_RE, 1)
    anchor = F.regexp_extract(F.col("tag"), r">([^<]*)</a>", 1)
    pairs = tags.select(
        resolve_link(F.col("base"), link).alias("dst"), anchor.alias("anchor")
    ).where(F.col("dst").isNotNull() & (F.col("anchor") != ""))

    counts = pairs.groupBy("dst", "anchor").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("anchor"))
    totals = counts.groupBy("dst").agg(
        F.sum("cnt").cast("bigint").alias("n_anchors"),
        F.count("*").cast("bigint").alias("n_unique_anchors"),
    )
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("dst", F.col("anchor").alias("top_anchor"))
    )
    return totals.join(top, "dst")


def host_graph(edges: DataFrame) -> DataFrame:
    """Host-level link graph: collapse the URL edge list to
    (src_host, dst_host, n_links, intra) — the domain-level view the
    crawl scheduler actually budgets on (inter-host edges are the
    discovery signal; intra-host edges are site structure).

    Pure rollup of the already-distinct URL edges: the groupBy is
    map-side combinable and its output is bounded by host-pairs, so the
    exchange is tiny regardless of how many URL edges a portal has.
    """
    h = lambda c: F.regexp_extract(F.col(c), r"^https?://([^/]+)", 1)  # noqa: E731
    return (
        edges.select(h("src").alias("src_host"), h("dst").alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("bigint").alias("n_links"))
        .withColumn("intra", F.col("src_host") == F.col("dst_host"))
    )
