"""Tests for ANN search (operators/similarity.py): brute-force cosine top-k
against a numpy oracle, and the IVF recall property the flagship query
claims (recall@5 of ivf_topk vs cosine_topk on the sf0.01 embeddings)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
    assign_centroids,
    cosine_topk,
    ivf_topk,
)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _vectors(n=40, dim=12, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim)
    return [(i, [float(x) for x in v[i]]) for i in range(n)]


def py_cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return round(
        dot
        / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))),
        6,
    )


def test_cosine_topk_matches_bruteforce(spark):
    rows = _vectors()
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(i, v) for i, v in rows[:5]], "q_id long, q_vec array<double>"
    )
    got = {
        (r.q_id, r.rank): (r.vec_id, r.cosine)
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    vec = dict(rows)
    for qid, qv in rows[:5]:
        scored = sorted(
            ((py_cosine(v, qv), -i) for i, v in rows if i != qid), reverse=True
        )
        for rank in range(1, 6):
            c, neg_i = scored[rank - 1]
            assert got[(qid, rank)] == (-neg_i, pytest.approx(c, abs=1e-6))


def test_cosine_topk_excludes_self_and_ranks_dense(spark):
    rows = _vectors(n=20)
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(i, v) for i, v in rows[:3]], "q_id long, q_vec array<double>"
    )
    out = cosine_topk(corpus, queries, k=4).collect()
    by_q = {}
    for r in out:
        assert r.vec_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3, 4]


def test_assign_centroids_partitions_corpus(spark):
    rows = _vectors(n=30)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = assign_centroids(df, ncentroids=4)
    a = assigned.collect()
    assert len(a) == 30  # every vector assigned to exactly one centroid
    assert {r.cid for r in a} <= {r.cid for r in cents.collect()}
    assert cents.count() == 4


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")),
    reason="sf0.01 testdata not present",
)
def test_ivf_recall_at_5_vs_exact(spark):
    """The recall property q_embedding_ann_ivf claims: recall@5 of the
    IVF-probed search vs the exact brute-force top-5, on the same 10
    queries the flagship query uses, must be >= 0.8."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = (
        emb.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    exact = {
        (r.q_id, r.vec_id) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_topk(emb, q, k=5, ncentroids=8, nprobe=3).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"IVF recall@5 = {recall}"
