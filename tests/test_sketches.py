"""HyperLogLog host-cardinality sketch: python-reference parity,
estimator accuracy, and the mergeability property that makes it the
right state at frontier scale."""

import hashlib
import math
import os

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.sketches import (
    _ALPHA, _M, _RHO_MAX, host_url_hll,
)

_LZ = {
    "1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1,
}


def py_bucket_rho(url: str):
    h = hashlib.md5(url.encode()).hexdigest()
    bucket = int(h[:2], 16)
    sub = h[2:17]
    tail = sub.lstrip("0")
    if not tail:
        return bucket, _RHO_MAX
    return bucket, 4 * (15 - len(tail)) + _LZ.get(tail[0], 0) + 1


def py_hll(urls):
    regs = {}
    for u in urls:
        b, r = py_bucket_rho(u)
        regs[b] = max(regs.get(b, 0), r)
    z = sum(2.0 ** -m for m in regs.values()) + (_M - len(regs))
    raw = _ALPHA * _M * _M / z
    zeros = _M - len(regs)
    if raw <= 2.5 * _M and zeros > 0:
        return _M * math.log(_M / zeros)
    return raw


def test_spark_matches_python_reference(spark, fix_small):
    pages = spark.read.parquet(os.path.join(fix_small, "pages.parquet"))
    got = {
        r["host"]: r
        for r in host_url_hll(pages).collect()
    }
    rows = pages.select("url").collect()
    by_host = {}
    for (u,) in rows:
        host = u.split("/")[2]
        by_host.setdefault(host, set()).add(u)
    assert set(got) == set(by_host)
    for host, urls in by_host.items():
        r = got[host]
        assert r["exact_distinct"] == len(urls)
        assert r["est_distinct"] == pytest.approx(py_hll(urls), abs=1e-3)


def test_estimator_accuracy_at_scale(spark, fix_small):
    """m=256 gives ~6.5% standard error; allow 4 sigma on real hosts."""
    pages = spark.read.parquet(os.path.join(fix_small, "pages.parquet"))
    rows = host_url_hll(pages).where("exact_distinct >= 500").collect()
    assert rows, "fixture should have at least one host with 500+ urls"
    for r in rows:
        assert abs(r["rel_err"]) < 0.26, (r["host"], r["rel_err"])


def test_registers_merge_by_max():
    """The frontier-scale property: sketches of two crawl days merge by
    register-wise max, giving exactly the sketch of the union."""
    day1 = [f"https://h.example/p/{i}" for i in range(2000)]
    day2 = [f"https://h.example/p/{i}" for i in range(1000, 3000)]

    def regs(urls):
        out = {}
        for u in urls:
            b, r = py_bucket_rho(u)
            out[b] = max(out.get(b, 0), r)
        return out

    merged = regs(day1)
    for b, r in regs(day2).items():
        merged[b] = max(merged.get(b, 0), r)
    assert merged == regs(day1 + day2)


def test_rho_distribution_sane():
    """rho is geometric(1/2): mean ~2 over uniform hashes."""
    urls = [f"https://x/{i}" for i in range(4096)]
    rhos = [py_bucket_rho(u)[1] for u in urls]
    assert 1.8 < sum(rhos) / len(rhos) < 2.2
    assert max(rhos) <= _RHO_MAX


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def py_cms_bucket(tok: str, seed: str, width: int) -> int:
    h = hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()
    return int(h[:5], 16) % width


def test_cms_matches_python_reference(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sketches import (
        token_cms_topk,
    )

    docs = spark.createDataFrame(
        [(i, "a b b c c c d d d d e " + "hot " * (i % 5)) for i in range(40)],
        ["doc_id", "text"],
    )
    width, depth = 8, 4
    got = {r["token"]: r for r in token_cms_topk(docs, width=width, k=50).collect()}

    # exact counts in python
    from collections import Counter

    exact = Counter()
    for i in range(40):
        exact.update(("a b b c c c d d d d e " + "hot " * (i % 5)).split())
    counters = [Counter() for _ in range(depth)]
    for tok, c in exact.items():
        for d in range(depth):
            counters[d][py_cms_bucket(tok, f"cms{d}", width)] += c
    for tok, c in exact.items():
        est = min(
            counters[d][py_cms_bucket(tok, f"cms{d}", width)] for d in range(depth)
        )
        assert got[tok]["exact_cnt"] == c
        assert got[tok]["cms_est"] == est


def test_cms_never_underestimates(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sketches import (
        token_cms_topk,
    )

    docs = spark.createDataFrame(
        [(u,) for u in [f"w{i % 7} common w{i % 13}" for i in range(200)]],
        ["text"],
    )
    rows = token_cms_topk(docs, width=4, k=50).collect()
    assert rows
    for r in rows:
        assert r["overestimate"] >= 0, r


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

def py_es_key(doc_id, weight, salt="wsample-v1"):
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    u = (int(h[:15], 16) + 0.5) / float(1 << 60)
    return u ** (1.0 / weight) if weight > 0 else -1.0


def test_weighted_sample_matches_python_reference(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 10 + (i * 37) % 900) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = weighted_sample(df, k=50).collect()
    expect = sorted(rows, key=lambda r: (-py_es_key(r[0], r[1]), r[0]))[:50]
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]


def test_weighted_sample_proportional(spark):
    """Across independent salts, heavy rows win far more often."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 1000 if i < 50 else 10) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    heavy = 0
    for s in range(5):
        got = weighted_sample(df, k=50, salt=f"s{s}").collect()
        heavy += sum(1 for r in got if r["doc_id"] < 50)
    # heavy rows are 10% of rows but 10x weight -> expect ~80%+ of picks
    assert heavy / 250 > 0.6


def test_weighted_sample_excludes_nonpositive(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, -5), (4, 100)], ["doc_id", "n_chars"]
    )
    got = {r["doc_id"] for r in weighted_sample(df, k=2).collect()}
    assert got == {1, 4}
