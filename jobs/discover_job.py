"""spark-submit entrypoint for the frontier DISCOVERY loop: robots.txt
bodies + advertised sitemaps → robots-filtered frontier seed rows.

    spark-submit --py-files /path/to/spark_graft_pkg.zip \
        jobs/discover_job.py --fixture-dir fixtures/tiny \
        --out /tmp/discovered

Dataflow (all operators first-class in the engine):

1. ``operators/robotstxt.py:parse_robots`` — per-host robots bodies →
   the engine's robots table (RFC 9309 semantics), including each
   host's advertised ``Sitemap:`` URLs;
2. ``operators/sitemaps.py:sitemap_urls`` — sitemap / sitemap-index
   documents → candidate URL rows; nested indexes expand one level by
   joining the references back onto the sitemap table (the standard
   two-level topology — CC-scale sitemap trees are depth ≤ 2 in
   practice, and another iteration of the same join covers deeper);
3. ``operators/politeness.py:robots_filter`` — candidates whose path
   hits a disallow prefix for their host are dropped BEFORE they ever
   reach the frontier;
4. the surviving (netloc, url, lastmod) rows land as a seeds-shaped
   parquet, dedup'd exactly (url-level groupBy — at 10^10 scale this is
   the bloom/cuckoo pre-filter + exact verify of the crawl path).

The reference crawls a fixed seed list (Scrapy ``start_urls``); the
discovery job is the web-scale generalization every production crawler
runs instead, built from the same parsed inputs a polite crawler must
fetch anyway.  Zero Python outside the two Arrow parse passes; the only
shuffle is the final url-dedup groupBy.
"""

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir", required=True,
                    help="dir with robots_txt.parquet + sitemaps.parquet")
    ap.add_argument("--out", required=True, help="output dir (parquet)")
    ap.add_argument("--user-agent", default="*")
    ap.add_argument("--rfc-rules", action="store_true",
                    help="use full RFC 9309 rule matching (wildcards, "
                         "longest-match, Allow precedence) instead of "
                         "the prefix hot path")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from scrapy_crawler_german_real_estate_sites_spark.operators.politeness import (
        robots_filter,
        robots_filter_rfc,
    )
    from scrapy_crawler_german_real_estate_sites_spark.operators.robotstxt import (
        parse_robots,
    )
    from scrapy_crawler_german_real_estate_sites_spark.operators.sitemaps import (
        sitemap_urls,
    )

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("spark-crawl-discover").getOrCreate()
    import os

    robots_bodies = spark.read.parquet(
        os.path.join(args.fixture_dir, "robots_txt.parquet"))
    sitemap_docs = spark.read.parquet(
        os.path.join(args.fixture_dir, "sitemaps.parquet"))

    robots = parse_robots(robots_bodies, user_agent=args.user_agent).cache()

    # start from each host's ADVERTISED sitemaps (robots Sitemap: lines),
    # not from a directory listing — discovery honors what hosts publish
    advertised = robots.select(
        "netloc", F.explode("sitemaps").alias("url"))
    docs = sitemap_docs.join(advertised, ["netloc", "url"], "left_semi")

    entries = sitemap_urls(docs, src_col="url", xml_col="xml")
    # expand nested sitemap indexes one level: index rows reference other
    # documents in the sitemap table by url
    nested = (
        entries.where(F.col("is_index"))
        .select(F.col("url").alias("ref"))
        .join(sitemap_docs, F.col("ref") == F.col("url"), "inner")
        .select("netloc", "url", "xml")
    )
    leaf = entries.where(~F.col("is_index"))
    leaf2 = sitemap_urls(nested, src_col="url", xml_col="xml") \
        .where(~F.col("is_index"))
    candidates = leaf.unionByName(leaf2).withColumn(
        "netloc", F.regexp_extract("url", r"^https?://([^/]+)", 1))

    if args.rfc_rules:
        allowed, blocked = robots_filter_rfc(
            candidates,
            robots.select("netloc", "disallow_prefixes", "allow_prefixes"),
        )
    else:
        allowed, blocked = robots_filter(
            candidates,
            robots.select("netloc", "crawl_delay_s", "max_concurrent",
                          "disallow_prefixes"),
        )
    seeds = (
        allowed.groupBy("netloc", "url")
        .agg(F.max("lastmod").alias("lastmod"))
    )
    seeds.write.mode("overwrite").parquet(args.out)
    print(json.dumps({
        "hosts": robots.count(),
        "sitemap_docs": docs.count(),
        "candidates": candidates.count(),
        "blocked": blocked.count(),
        "seeds": seeds.count(),
    }))
    robots.unpersist()
    if owns_session:  # spark-submit path; in-process callers keep theirs
        spark.stop()


if __name__ == "__main__":
    main()
