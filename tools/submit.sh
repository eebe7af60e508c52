#!/usr/bin/env bash
# Build the --py-files zip and spark-submit the crawl job.
#
#   tools/submit.sh [--master local[8]] [extra crawl_job args...]
#
# north_rule: "run via spark-submit --py-files on a multi-executor cluster"
# — the same command line works against YARN/k8s/standalone masters; the
# sandbox default is local[N].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[8]"
if [ "${1:-}" = "--master" ]; then MASTER="$2"; shift 2; fi

ZIP="$(mktemp -d)/spark_graft_pkg.zip"
(cd "$REPO" && zip -qr "$ZIP" scrapy_crawler_german_real_estate_sites_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  "$REPO/jobs/crawl_job.py" "$@"
