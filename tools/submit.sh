#!/usr/bin/env bash
# Build the --py-files zip and spark-submit the crawl job.
#
#   tools/submit.sh [--master local[8]] [extra crawl_job args...]
#
# north_rule: "run via spark-submit --py-files on a multi-executor cluster"
# — the same command line works against YARN/k8s/standalone masters; the
# sandbox default is local[N].
#   tools/submit.sh --job corpus --in .../documents.parquet --out /tmp/clean
#   tools/submit.sh --job health --pages .../pages.parquet --out /tmp/health
# picks the corpus-hygiene job (jobs/corpus_job.py); --job retention the
# delete sweep; default is the crawl.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[8]"
JOB="crawl"
while :; do
  case "${1:-}" in
    --master) MASTER="$2"; shift 2 ;;
    --job) JOB="$2"; shift 2 ;;
    *) break ;;
  esac
done

ZIP="$(mktemp -d)/spark_graft_pkg.zip"
(cd "$REPO" && zip -qr "$ZIP" scrapy_crawler_german_real_estate_sites_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  "$REPO/jobs/${JOB}_job.py" "$@"
