"""Known-answer tests for operators/cluster.py — connected components via
alternating large-star/small-star, and the keep-one-per-cluster rule."""

import random

import pytest
from pyspark.sql import functions as F

from scrapy_crawler_german_real_estate_sites_spark.operators.cluster import (
    connected_components, dedup_clusters,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r.id: r.component for r in out.collect()}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (worst case for naive propagation) + triangle 10-11-12
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    assert _cc(spark, edges) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
    }


def test_direction_and_duplicates_ignored(spark):
    edges = [(2, 1), (1, 2), (2, 3), (3, 2), (2, 3)]
    assert _cc(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_singleton_pair_and_empty(spark):
    assert _cc(spark, [(7, 8)]) == {7: 7, 8: 7}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_long_chain_converges_within_log_rounds(spark):
    # 64-node chain: naive min-propagation needs 63 rounds; the star
    # algorithm must finish well inside max_iter=12 (O(log^2 n))
    edges = [(i, i + 1) for i in range(64)]
    labels = _cc(spark, edges, max_iter=12)
    assert set(labels.values()) == {0}
    assert len(labels) == 65


def test_random_graph_matches_union_find(spark):
    rng = random.Random(41)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]

    # driver-side union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for a, b in edges:
        for n in (a, b):
            expect[n] = find(n)

    assert _cc(spark, edges) == expect


def test_dedup_clusters_keep_rule(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "id_a long, id_b long"
    )
    rows = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, True), 3: (0, False), 5: (0, False),
        1: (1, True), 2: (1, False),
    }
    # doc 4 has no pair: implicitly canonical, not emitted
    assert 4 not in rows
