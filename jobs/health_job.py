"""spark-submit entrypoint for the crawl-health report — the host-level
operational rollups a frontier scheduler consumes each cycle, composed
as one shippable job over a north-rule pages table:

* distinct-URL cardinality per host (HyperLogLog estimate + exact,
  ``operators/sketches.py``),
* spider-trap triage (deep paths / loops / param explosions / calendar,
  ``operators/traps.py``),
* boilerplate census rolled up per host (content-char share of the
  fetched bytes, ``operators/boilerplate.py``),
* domain-level link graph degree (inter-host in/out discovery edges,
  ``operators/graph.py:host_graph``).

    spark-submit --py-files /path/to/spark_graft_pkg.zip \
        jobs/health_job.py --pages /data/pages --out /tmp/health

Every component is a hosts-wide rollup, so the report's exchanges are
bounded by host count regardless of page volume; the expensive inputs
(pages scan, edge extraction) are each read once.  Prints a one-line
JSON summary and writes one parquet row per host.
"""

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="input pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--out", required=True, help="output parquet dir")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from scrapy_crawler_german_real_estate_sites_spark.operators.boilerplate import (
        boilerplate_stats,
    )
    from scrapy_crawler_german_real_estate_sites_spark.operators.graph import (
        extract_edges, host_graph,
    )
    from scrapy_crawler_german_real_estate_sites_spark.operators.sketches import (
        host_col, host_url_hll,
    )
    from scrapy_crawler_german_real_estate_sites_spark.operators.traps import (
        trap_report,
    )

    spark = SparkSession.builder.appName("spark-crawl-health").getOrCreate()
    pages = spark.read.parquet(args.pages)

    hll = host_url_hll(pages)
    traps = trap_report(pages).drop("n_urls")

    boiler = (
        boilerplate_stats(pages)
        .select(host_col("url").alias("host"), "content_chars", "n_lines",
                "boiler_lines")
        .groupBy("host")
        .agg(
            F.sum("content_chars").cast("bigint").alias("content_chars"),
            F.round(F.sum("boiler_lines") / F.sum("n_lines"), 4)
            .alias("boiler_line_share"),
        )
    )

    hg = host_graph(extract_edges(pages))
    inter = hg.where(~F.col("intra"))
    degrees = (
        inter.groupBy(F.col("src_host").alias("host"))
        .agg(F.sum("n_links").cast("bigint").alias("out_links"))
        .join(
            inter.groupBy(F.col("dst_host").alias("host"))
            .agg(F.sum("n_links").cast("bigint").alias("in_links")),
            "host",
            "full_outer",
        )
        .fillna(0, ["out_links", "in_links"])
    )

    report = (
        hll.join(traps, "host", "left")
        .join(boiler, "host", "left")
        .join(degrees, "host", "left")
        .fillna(0, ["out_links", "in_links"])
    )
    report.write.mode("overwrite").parquet(args.out)

    out = spark.read.parquet(args.out)
    summary = out.agg(
        F.count("*").alias("hosts"),
        F.sum("n_pages").alias("pages"),
        F.sum("n_suspect").alias("trap_suspects"),
        F.sum("content_chars").alias("content_chars"),
    ).collect()[0]
    print(json.dumps({
        "hosts": summary["hosts"],
        "pages": int(summary["pages"]),
        "trap_suspects": int(summary["trap_suspects"]),
        "content_chars": int(summary["content_chars"]),
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
