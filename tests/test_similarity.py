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


# ---------------------------------------------------------------------------
# product quantization (pq_encode / pq_topk)
# ---------------------------------------------------------------------------

def _structured_vectors(groups=10, per=6, dim=32, seed=11):
    """Clustered corpus (what PQ is built for): `groups` anchors, `per`
    noisy members each — nearest neighbors are the within-group members."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for g in range(groups):
        anchor = rng.randn(dim) * 4
        for j in range(per):
            v = anchor + 0.15 * rng.randn(dim)
            rows.append((g * per + j, [float(x) for x in v]))
    return rows


def test_pq_codes_are_complete_and_deterministic(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        pq_encode,
    )

    rows = _structured_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, books = pq_encode(df, m=4, ksub=8, subdim=8)
    got = codes.collect()
    # every vector carries exactly m codes, one per subspace
    per_vec = {}
    for r in got:
        per_vec.setdefault(r.vec_id, set()).add(r.s)
    assert all(v == set(range(4)) for v in per_vec.values())
    # codes reference live codebook entries
    live = {(r.s, r.code) for r in books.collect()}
    assert {(r.s, r.code) for r in got} <= live
    # deterministic under repartitioning
    again = {
        (r.vec_id, r.s, r.code)
        for r in pq_encode(df.repartition(7, "vec_id"), m=4, ksub=8, subdim=8)[0].collect()
    }
    assert {(r.vec_id, r.s, r.code) for r in got} == again


def test_pq_topk_finds_planted_groups(spark):
    """On clustered data the ADC ranking alone must put within-group
    members at the top: recall@(per-1) of group members >= 0.9."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        pq_topk,
    )

    rows = _structured_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(i, v) for i, v in rows if i % 6 == 0],
        "q_id long, q_vec array<double>",
    )
    got = {}
    for r in pq_topk(df, q, k=5, m=4, ksub=16, subdim=8).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = total = 0
    for qid, members in got.items():
        group = {qid + d for d in range(1, 6)}  # the 5 other group members
        hits += len(members & group)
        total += 5
    assert total and hits / total >= 0.9, hits / total


def test_pq_rerank_matches_exact_topk(spark):
    """With rerank >= corpus size the refinement stage must reproduce the
    exact L2 top-k (quantization can then only affect which candidates
    enter the re-rank, and here all of them do)."""
    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        pq_topk,
    )

    rows = _vectors(n=50, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(i, v) for i, v in rows[:6]], "q_id long, q_vec array<double>"
    )
    got = {
        (r.q_id, r.rank): r.vec_id
        for r in pq_topk(df, q, k=3, m=4, ksub=8, subdim=4, rerank=50).collect()
    }
    V = {i: np.asarray(v) for i, v in rows}
    for qid, qv in rows[:6]:
        d = sorted(
            (round(float(np.sum((V[i] - np.asarray(qv)) ** 2)), 6), i)
            for i in V if i != qid
        )
        for rank, (_, i) in enumerate(d[:3], start=1):
            assert got[(qid, rank)] == i, (qid, rank)


def test_ivfadc_full_probe_full_rerank_equals_exact(spark):
    """With every shard probed and the whole corpus re-ranked, the IVFPQ
    composition must reproduce the exact COSINE top-k (the family metric
    the re-rank uses, like ivf_topk/cosine_topk) — pruning and
    quantization can then only reorder candidates the re-rank restores."""
    import numpy as np

    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        ivfadc_topk,
    )

    rows = _vectors(n=48, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(i, v) for i, v in rows[:5]], "q_id long, q_vec array<double>"
    )
    got = {
        (r.q_id, r.rank): r.vec_id
        for r in ivfadc_topk(
            df, q, k=3, ncentroids=4, nprobe=4, m=4, ksub=8, subdim=4,
            rerank=48,
        ).collect()
    }
    V = {i: np.asarray(v) for i, v in rows}
    for qid, qv in rows[:5]:
        qv = np.asarray(qv)
        d = sorted(
            ((-round(float(V[i] @ qv
                           / (np.linalg.norm(V[i]) * np.linalg.norm(qv))),
                     6), i)
             for i in V if i != qid)
        )
        for rank, (_, i) in enumerate(d[:3], start=1):
            assert got[(qid, rank)] == i, (qid, rank)


def test_ivfadc_recall_on_planted_groups(spark):
    """Pruned probing + ADC + re-rank keeps within-group recall high on
    clustered data (the regime the index is for)."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        ivfadc_topk,
    )

    rows = _structured_vectors(groups=8, per=6, dim=32)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(i, v) for i, v in rows if i % 6 == 0],
        "q_id long, q_vec array<double>",
    )
    got = {}
    res = ivfadc_topk(
        df, q, k=5, ncentroids=8, nprobe=2, m=4, ksub=16, subdim=8, rerank=12
    ).collect()
    for r in res:
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = total = 0
    for qid, members in got.items():
        group = {qid + d for d in range(1, 6)}
        hits += len(members & group)
        total += 5
    assert total and hits / total >= 0.9, hits / total


# ---------------------------------------------------------------------------
# recall on the Zipf-clustered fixture (VERDICT r3 item 5): real embedding
# corpora are clustered with heavy-tailed cluster sizes; near-random vectors
# are PQ/IVF's documented worst case.  Numbers recorded in COVERAGE.md.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_emb(spark, fix_tiny):
    from scrapy_crawler_german_real_estate_sites_spark.sources.synth import (
        _write_clustered_embeddings,
    )

    path = _write_clustered_embeddings(fix_tiny)
    return spark.read.parquet(path)


def _clustered_recall(spark, emb_full, search):
    emb = emb_full.select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {(r.q_id, r.vec_id) for r in search(emb, q).collect()}
    return len(got & exact) / len(exact)


def test_fixture_cluster_sizes_are_zipf(clustered_emb):
    sizes = sorted(
        (r["cnt"] for r in
         clustered_emb.groupBy("cluster_id").count()
         .withColumnRenamed("count", "cnt").collect()),
        reverse=True,
    )
    assert len(sizes) == 48
    # heavy tail: biggest cluster dominates, smallest are singletons
    assert sizes[0] > 20 * sizes[-1]
    assert sizes[0] > 0.15 * sum(sizes)


def test_ivf_recall_on_clustered_fixture(spark, clustered_emb):
    r = _clustered_recall(
        spark, clustered_emb,
        lambda emb, q: ivf_topk(emb, q, k=5, ncentroids=32, nprobe=4),
    )
    # measured 0.903 (31 queries spanning head + tail clusters)
    assert r >= 0.85, f"IVF clustered recall@5 = {r}"


def test_pq_rerank_recall_on_clustered_fixture(spark, clustered_emb):
    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        pq_topk,
    )

    with_rr = _clustered_recall(
        spark, clustered_emb,
        lambda emb, q: pq_topk(emb, q, k=5, m=8, ksub=64, subdim=4,
                               rerank=200),
    )
    no_rr = _clustered_recall(
        spark, clustered_emb,
        lambda emb, q: pq_topk(emb, q, k=5, m=8, ksub=64, subdim=4),
    )
    # measured 0.794 vs 0.232: within a tight cluster the members quantize
    # to near-identical codes, so ADC alone cannot rank them — the exact
    # re-rank is what buys recall on clustered data.  Pin both the
    # operating point and the mechanism.
    assert with_rr >= 0.70, f"PQ+rerank clustered recall@5 = {with_rr}"
    assert with_rr >= 2 * no_rr, (with_rr, no_rr)


def test_ivfadc_recall_on_clustered_fixture(spark, clustered_emb):
    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        ivfadc_topk,
    )

    mid = _clustered_recall(
        spark, clustered_emb,
        lambda emb, q: ivfadc_topk(emb, q, k=5, ncentroids=32, nprobe=8,
                                   m=8, ksub=64, subdim=4, rerank=200),
    )
    big = _clustered_recall(
        spark, clustered_emb,
        lambda emb, q: ivfadc_topk(emb, q, k=5, ncentroids=32, nprobe=12,
                                   m=8, ksub=64, subdim=4, rerank=400),
    )
    big_raw = _clustered_recall(
        spark, clustered_emb,
        lambda emb, q: ivfadc_topk(emb, q, k=5, ncentroids=32, nprobe=12,
                                   m=8, ksub=64, subdim=4, rerank=400,
                                   encode_residuals=False),
    )
    # measured (round 5, residual encoding + family-metric cosine rerank):
    # 0.877 at nprobe=8/rerank=200, 0.987 at nprobe=12/rerank=400 vs
    # 0.974 raw-encoded at the same point.  The round-4 0.755 ceiling was
    # the L2-rerank-vs-cosine-truth METRIC MISMATCH (exact-L2 top-5 vs
    # cosine top-5 agrees only 0.845 on these unnormalized vectors), not
    # a quantization limit — fixed by re-ranking in the family metric;
    # residual encoding then buys the last points of pool quality.
    assert mid >= 0.85, f"IVFADC clustered recall@5 = {mid}"
    assert big >= 0.95, f"IVFADC clustered recall@5 (wide) = {big}"
    assert big >= big_raw, (big, big_raw)


def test_semdedup_collapses_zipf_clusters(spark, clustered_emb):
    """SemDeDup on the Zipf-clustered fixture (VERDICT r3 item 5's last
    leg): tight generator clusters ARE semantic-duplicate families, so
    the drop list must collapse them near-completely, and keepers must be
    pairwise below threshold within every k-means cell."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import (
        semdedup,
    )

    emb = clustered_emb.select("vec_id", "embedding")
    n = emb.count()
    drops = semdedup(emb, threshold=0.97, ncentroids=16)
    dropped = {r.vec_id for r in drops.collect()}
    kept = n - len(dropped)
    # 48 generator clusters -> keeper count collapses to the same order
    # (cluster-boundary splits across k-means cells keep it above 48)
    assert kept < 0.1 * n, f"kept {kept} of {n}"
    assert kept >= 48
    # ground-truth check: every generator cluster retains >=1 keeper
    truth = {r.vec_id: r.cluster_id for r in clustered_emb.collect()}
    kept_clusters = {truth[v] for v in truth if v not in dropped}
    assert kept_clusters == set(range(48))
