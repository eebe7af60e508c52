"""spark-submit entrypoint for the corpus-hygiene pipeline — the
training-data cleaning chain (quality gate → exact dedup → normalized
dedup → line dedup → PII redaction → split assignment) as one shippable
job over a documents table.

    spark-submit --py-files /path/to/spark_graft_pkg.zip \
        jobs/corpus_job.py --in /data/documents --out /tmp/clean \
        [--valid-frac 0.05] [--id-col doc_id] [--text-col text]

Prints a one-line JSON summary (rows in/out, per-split counts) and writes
the cleaned corpus as parquet partitioned by ``split`` — so downstream
training readers prune to their split at the directory level.
"""

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True,
                    help="input documents parquet (id + text columns)")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--valid-frac", type=float, default=0.05)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from scrapy_crawler_german_real_estate_sites_spark.operators.pipeline import (
        clean_corpus,
    )

    spark = SparkSession.builder.appName("spark-crawl-corpus-clean").getOrCreate()
    docs = spark.read.parquet(args.inp)
    n_in = docs.count()
    cleaned = clean_corpus(
        docs, id_col=args.id_col, text_col=args.text_col,
        valid_frac=args.valid_frac,
    )
    cleaned.write.mode("overwrite").partitionBy("split").parquet(args.out)

    out = spark.read.parquet(args.out)
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({
        "rows_in": n_in,
        "rows_out": sum(per_split.values()),
        "per_split": per_split,
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
