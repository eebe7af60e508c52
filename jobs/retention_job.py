"""spark-submit entrypoint for the retention / liveness delete sweep —
the executed sink side of D9/D10 (reference ``database.py:27-37`` /
``database.py:125-129``: per-row Mongo deletes, re-expressed as ONE
set-oriented row-level delete).

    spark-submit --py-files /path/to/spark_graft_pkg.zip \
        jobs/retention_job.py --table /data/listings \
        --candidates /tmp/liveness_gone.parquet --key url

``--candidates`` is any parquet of delete keys — e.g. the output of the
``liveness_gone`` (dead-listing markers) or ``retention_candidates``
(expired event-time window) queries.  With
``SPARK_GRAFT_TABLE_FORMAT=iceberg`` the delete executes as
``MERGE INTO … WHEN MATCHED THEN DELETE`` (row-level delete files, no
table rewrite); the parquet fallback rewrites via anti-join.
"""

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="state table path (parquet dir or Iceberg-mapped)")
    ap.add_argument("--candidates", required=True,
                    help="parquet of delete keys")
    ap.add_argument("--key", default="url", nargs="+",
                    help="key column(s) to match on")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from scrapy_crawler_german_real_estate_sites_spark.sources import tables

    spark = SparkSession.builder.appName("spark-crawl-retention").getOrCreate()
    keys = spark.read.parquet(args.candidates)
    key_cols = args.key if isinstance(args.key, list) else [args.key]
    n = tables.delete_rows(spark, args.table, keys, key_cols=tuple(key_cols))
    print(json.dumps({"deleted": n, "table": args.table,
                      "format": tables.table_format()}))
    spark.stop()


if __name__ == "__main__":
    main()
