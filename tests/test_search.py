"""Known-answer test for operators/search.py — BM25 top-k vs a pure-python
reference implementation of the Okapi formula on the same tiny corpus."""

import math

from scrapy_crawler_german_real_estate_sites_spark.operators.search import bm25_topk

DOCS = [
    (0, "spark join spark shuffle"),
    (1, "merge sort merge merge tree"),
    (2, "vector index scan"),
    (3, "spark merge vector spark"),
    (4, "nothing relevant here at all"),
    (5, "spark"),
]
TERMS = ["spark", "merge", "vector"]
K1, B = 1.2, 0.75


def _ref_scores():
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in TERMS
    }
    idf = {q: math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0) for q in TERMS}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for q in TERMS:
            tf = v.count(q)
            if tf:
                s += idf[q] * (tf * (K1 + 1)) / (
                    tf + K1 * (1 - B + B * len(v) / avgdl)
                )
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_topk(docs, TERMS, k=10).collect()}
    assert got == _ref_scores()


def test_bm25_topk_order_and_limit(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, TERMS, k=2).collect()
    ref = sorted(_ref_scores().items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id, r.score) for r in rows] == ref
    # doc 4 matches no term: never emitted even with a large k
    all_rows = bm25_topk(docs, TERMS, k=100).collect()
    assert 4 not in {r.doc_id for r in all_rows}
