"""Benchmark decontamination (operators/decontam.py): contamination must
equal a plain-python n-gram overlap reference, and decontaminate must
remove exactly the contaminated ids."""

import re

import pytest
from pyspark.sql import functions as F

from scrapy_crawler_german_real_estate_sites_spark.operators.decontam import (
    contamination,
    decontaminate,
)

DOCS = [
    # (doc_id, text) — doc 2 copies a benchmark sentence verbatim, doc 3
    # shares a 4-gram via a partial quote, doc 4 is clean, doc 5 shares
    # grams with TWO benchmark docs
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "he said the quick brown fox jumps over everything"),
    (3, "five dozen liquor jugs were found"),
    (4, "completely unrelated text about spark partitions"),
    (5, "the quick brown fox carried five dozen liquor jugs"),
    (6, "short text"),
]
BENCH_IDS = {0, 1}


def _grams(text, n):
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _expected(n):
    bench = set()
    for i in BENCH_IDS:
        bench |= _grams(DOCS[i][1], n)
    out = {}
    for doc_id, text in DOCS:
        if doc_id in BENCH_IDS:
            continue
        hits = _grams(text, n) & bench
        if hits:
            out[doc_id] = len(hits)
    return out


@pytest.mark.parametrize("n", [3, 4])
def test_contamination_matches_python_reference(spark, n):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = df.where(F.col("doc_id").isin(list(BENCH_IDS)))
    corpus = df.where(~F.col("doc_id").isin(list(BENCH_IDS)))
    got = {r.doc_id: r.grams_hit for r in contamination(corpus, bench, n=n).collect()}
    assert got == _expected(n)


def test_decontaminate_removes_exactly_contaminated(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = df.where(F.col("doc_id").isin(list(BENCH_IDS)))
    corpus = df.where(~F.col("doc_id").isin(list(BENCH_IDS)))
    clean = {r.doc_id for r in decontaminate(corpus, bench, n=4).collect()}
    contaminated = set(_expected(4))
    all_corpus = {d for d, _ in DOCS} - BENCH_IDS
    assert clean == all_corpus - contaminated
    assert clean, "sanity: some documents must survive"


def test_benchmark_gram_set_broadcasts(spark):
    """Plan pin: the corpus side joins against a BROADCAST benchmark gram
    set — no shuffle of corpus shingles for the membership check."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = df.where(F.col("doc_id").isin(list(BENCH_IDS)))
    corpus = df.where(~F.col("doc_id").isin(list(BENCH_IDS)))
    plan = contamination(corpus, bench, n=4)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan
