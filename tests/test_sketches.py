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
