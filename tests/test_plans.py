"""Physical-plan shape assertions — the 100 TB guardrails.

Correctness is covered by the oracle gate and the parity suites; these
tests pin the PLAN properties that make each query viable at scale, so a
refactor that silently turns a hash join into a nested loop, un-pushes a
scan filter, or drops a top-k into a full global sort fails CI instead of
failing a cluster.

Checked over the formatted explain string (pre-execution plan — explicit
broadcast hints and scan pushdown are visible there; AQE runtime rewrites
only improve on it):

* no ``CartesianProduct`` anywhere, ever;
* ``BroadcastNestedLoopJoin`` only where a designed scalar/exact-baseline
  broadcast exists (whitelist with reasons);
* dedup/LSH self-joins are bucketed equi-joins, never all-pairs;
* scan-level filter pushdown where the query filters the fact table;
* top-k queries plan as ``TakeOrderedAndProject`` (per-partition heaps),
  not a global ``Sort``+limit;
* rank-then-filter windows use ``WindowGroupLimit`` (Spark 3.5+ group-
  limit pushdown);
* every oracle-backed relational query is UDF-free (no python eval nodes).
"""

import re

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

# queries that legitimately broadcast-nested-loop:
BNLJ_OK = {
    # 1-row corpus-scalar (N, avgdl) broadcast riding a cross join
    "bm25_search",
    # exact brute-force baseline: broadcast query set × corpus by design
    "embedding_topk",
    # 1-row normalizer scalar (Σ n_s^alpha) broadcast onto the O(sources)
    # dimension — the corpus itself joins via broadcast HASH join
    "temperature_mix",
    # k-row centroid table broadcast for the coarse-quantizer distance
    # sweep (similarity.assign_centroids); the pairwise candidate join
    # itself is a cid equi hash join
    "semdedup",
    # same designed centroid broadcast for the query-probe ranking; the
    # scoring joins are cid / (q_id,s,code) equi hash joins
    "embedding_ann_ivfpq",
    # 1-row epoch-midpoint scalar broadcast splitting the capture window
    # in-plan; the diff itself is a full-outer url equi hash join
    "capture_diff",
}

# iterative / crawl-driving queries: plan shape covered by the engine's
# own tests, running them here would execute a full crawl
SKIP = {"crawl_listings", "alerts", "embedding_ann_ivf", "dedup_clusters"}

PY_EVAL_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas")

# sources whose one Arrow pass IS the operator (byte/grammar unframing
# that no expression can express) — everything downstream must stay
# native: test_warc.py's pure-map plan assertion covers warc_ingest, and
# sitemap_ingest is the same shape (XML block unframing; its DuckDB
# oracle proves the extraction itself cross-engine).  seen_cuckoo's one
# Arrow pass is the vectorized cuckoo-table probe (with_cuckoo_flag) —
# the SAME broadcast-sketch probe the engine's live seen path runs; the
# exact verify join around it stays native and the oracle proves the
# output exactly.
ARROW_OK = {"warc_ingest", "sitemap_ingest", "seen_cuckoo"}


def _plan(spark, name):
    df = E.queries()[name](spark, SF)
    jvm = df._sc._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark):
    return {
        name: _plan(spark, name)
        for name in E.queries()
        if name not in SKIP
    }


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products in: {bad}"


def test_nested_loop_joins_only_where_designed(plans):
    bad = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_OK
    ]
    assert not bad, f"unexpected nested-loop joins in: {bad}"


def test_relational_queries_are_udf_free(plans):
    bad = [
        n for n, p in plans.items()
        if any(node in p for node in PY_EVAL_NODES) and n not in ARROW_OK
    ]
    assert not bad, f"python eval nodes in: {bad}"


@pytest.mark.parametrize("name", ["retention_candidates", "viertel_index",
                                  "embedding_neardup", "liveness_gone"])
def test_scan_filters_pushed(plans, name):
    assert re.search(r"PushedFilters: \[[^\]]", plans[name]), (
        f"{name}: no pushed filters reach the parquet scan"
    )


@pytest.mark.parametrize("name", ["sorted_scan_limit", "bm25_search",
                                  "weighted_sample", "token_cms"])
def test_topk_is_take_ordered(plans, name):
    assert "TakeOrderedAndProject" in plans[name], (
        f"{name}: top-k fell back to a global sort"
    )


@pytest.mark.parametrize("name", ["text_repetition"])
def test_rank_filter_uses_window_group_limit(plans, name):
    assert "WindowGroupLimit" in plans[name], (
        f"{name}: rank<=k filter not pushed into the window (group limit)"
    )


def test_lsh_joins_are_bucketed_equi_joins(plans):
    # the near-dup suite must candidate via bucket equi-joins; a nested
    # loop or cartesian here is the quadratic-all-pairs regression
    for name in ("dedup_minhash_lsh", "dedup_simhash", "embedding_neardup",
                 "dedup_ngram_jaccard"):
        p = plans[name]
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, (
            f"{name}: LSH candidate generation degenerated to all-pairs"
        )


def test_geocode_dim_join_is_hash_join(plans):
    # array_contains theta-join would plan BNLJ; the exploded dim must
    # keep this a broadcast hash join
    assert "BroadcastHashJoin" in plans["geocode_enrich"]
    assert "BroadcastNestedLoopJoin" not in plans["geocode_enrich"]


def test_crawl_fetch_join_never_shuffles_pages(spark, fix_tiny):
    """The engine's core scale invariant (north_rule: partitioning /
    shuffle handled explicitly): the per-wave fetch is pages ⋈
    broadcast(batch) — the wave batch is the BUILD side, the pages table
    streams from its cache, and the ONLY hash exchange on pages is the
    deliberate one-time cache layout (url-hash, REPARTITION_BY_NUM), never
    a per-wave ENSURE_REQUIREMENTS shuffle of html bytes."""
    from pyspark.sql import functions as F

    from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(spark, fix_tiny, hour=7, track_order=False)
    try:
        batch = eng.tagged.where(F.col("sel")).select(
            "seed_id", "fifo_seq", "url", "kind", "netloc", "meta", "depth"
        )
        fetched = eng.pages.join(F.broadcast(batch), "url", "inner")
        jvm = fetched._sc._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        p = fetched._jdf.queryExecution().explainString(mode)
    finally:
        eng.close()

    assert "BroadcastHashJoin" in p and "BuildRight" in p, (
        "fetch join is not a broadcast hash join building the wave batch"
    )
    assert "InMemoryTableScan" in p, "pages no longer stream from the cache"
    # column pruning reaches the parquet scan: the cache holds only what
    # the parse needs, not the full north-rule page row
    assert "ReadSchema: struct<url:string,html:binary>" in p
    # the only hash exchanges allowed are the deliberate one-time cache
    # layout (REPARTITION_BY_NUM; the formatted explain may list the
    # cached relation's plan more than once when the cache is shared) —
    # never a planner-inserted per-wave shuffle (ENSURE_REQUIREMENTS)
    hash_exchanges = re.findall(r"Arguments: hashpartitioning.*", p)
    assert hash_exchanges and all(
        "REPARTITION_BY_NUM" in x for x in hash_exchanges
    ), f"pages picked up a per-wave shuffle: {hash_exchanges}"
