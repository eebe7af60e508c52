"""Mergeable cardinality sketches for host-level crawl accounting.

At the 10^10-URL frontier scale the north rule targets, per-host
distinct-URL counts feed recrawl budgeting, trap triage, and frontier
sizing — but an exact ``COUNT(DISTINCT url)`` per host shuffles every
URL string to its host's reducer (and the big German portals are
exactly the skewed hosts that hurt).  A HyperLogLog register table
(Flajolet et al., AofA 2007) is the standard fix: the per-partition
state is one byte per register per host (max-of-rho), map-side
combinable, and merging across partitions / executors / crawl days is a
plain ``max`` — the same property that lets register tables checkpoint
next to the frontier and roll forward incrementally.

This implementation is **deterministic and engine-portable**: bucket
and rho both derive from ``md5(url)`` via string/CASE arithmetic only
(no float ``log2`` whose ulp could differ between libm builds), so the
DuckDB oracle replays the sketch register-for-register and the estimate
matches bit-for-bit.  All expressions are native Spark SQL functions —
the whole dataflow is two hash aggregations, no Python.

Layout of ``md5(url)`` (32 hex chars):

* hex chars 1..2   -> register index in [0, 256)   (p = 8 bits)
* hex chars 3..17  -> 60-bit substream; rho = 1 + number of leading
                      zero BITS (not hex digits), capped at 61 when the
                      whole substream is zero.

Estimator: ``alpha_256 * 256^2 / (sum 2^-M_j)`` with empty registers
contributing ``2^0``; linear-counting correction ``256 * ln(256/V)``
when the raw estimate is <= 2.5*256 and V (empty registers) > 0 —
exactly the original paper's recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# registers: p = 8 -> m = 256.  alpha_m = 0.7213 / (1 + 1.079/m).
_M = 256
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)
# substream is 60 bits (15 hex chars); an all-zero substream gets rho 61
_SUB_HEX = 15
_RHO_MAX = 4 * _SUB_HEX + 1

# leading zero bits inside the first non-zero hex digit
_LZ_IN_DIGIT = {
    "1": 3,
    "2": 2, "3": 2,
    "4": 1, "5": 1, "6": 1, "7": 1,
    "8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0, "e": 0, "f": 0,
}


def host_col(url_col: str = "url") -> Column:
    """Registered-host extraction shared with the oracle: the authority
    part of an absolute http(s) URL (regex, not ``parse_url`` — DuckDB
    has no parse_url, and the oracle must tokenize identically)."""
    return F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)


def hll_bucket_rho(url_col: str = "url") -> tuple[Column, Column]:
    """(register index, rho) columns for one URL — pure string/CASE
    arithmetic on md5 so any engine derives the identical pair."""
    h = F.md5(F.col(url_col))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    sub = F.substring(h, 3, _SUB_HEX)
    tail = F.regexp_replace(sub, "^0+", "")
    lz_hex = F.lit(_SUB_HEX) - F.length(tail)
    first = F.substring(tail, 1, 1)
    lz_bits = F.lit(0)
    for digit, lz in _LZ_IN_DIGIT.items():
        if lz:
            lz_bits = F.when(first == digit, lz).otherwise(lz_bits)
    rho = (
        F.when(F.length(tail) == 0, F.lit(_RHO_MAX))
        .otherwise(lz_hex * 4 + lz_bits + 1)
        .cast("int")
    )
    return bucket, rho


def cms_bucket(value: Column, seed: str, width: int) -> Column:
    """Count-min row hash: first 5 hex chars (20 bits) of the seeded md5,
    mod ``width`` — string arithmetic only, so DuckDB derives the same
    bucket (Cormode & Muthukrishnan, J.Alg 2005 use pairwise-independent
    hashes; seeded md5 slices are the engine-portable stand-in)."""
    h = F.md5(F.concat(F.lit(seed + ":"), value))
    return (F.conv(F.substring(h, 1, 5), 16, 10).cast("long") % width).cast("int")


def token_cms_topk(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    k: int = 50,
) -> DataFrame:
    """Heavy-hitter tokens with their count-min estimates next to exact
    counts: (token, exact_cnt, cms_est, overestimate).

    The production shape: the sketch is ``depth`` arrays of ``width``
    counters — 16 KiB of mergeable state per partition regardless of
    vocabulary size, merged by addition.  At small SF the counters are
    built from the pre-aggregated token table (identical semantics to
    per-occurrence increments, one shuffle narrower), and the exact
    counts ride along as the verifier.  Counter tables are ``width``
    rows, so the estimate lookups are broadcast joins; the top-k is
    TakeOrderedAndProject.  CMS guarantees est >= exact, with overshoot
    bounded by e*N/width w.p. 1-exp(-depth).
    """
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("token")
    )
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    with_buckets = exact.select(
        "token",
        "exact_cnt",
        *[
            cms_bucket(F.col("token"), f"cms{i}", width).alias(f"b{i}")
            for i in range(depth)
        ],
    )
    top = with_buckets.orderBy(
        F.desc("exact_cnt"), F.asc("token")
    ).limit(k)
    est_cols = []
    for i in range(depth):
        counters = (
            with_buckets.groupBy(f"b{i}")
            .agg(F.sum("exact_cnt").alias(f"c{i}"))
        )
        top = top.join(F.broadcast(counters), f"b{i}")
        est_cols.append(F.col(f"c{i}"))
    cms = F.least(*est_cols)
    return top.select(
        "token",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        cms.cast("bigint").alias("cms_est"),
        (cms - F.col("exact_cnt")).cast("bigint").alias("overestimate"),
    )


def host_url_hll(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host HLL distinct-URL estimate next to the exact count.

    Output: (host, n_pages, exact_distinct, est_distinct, rel_err).
    ``est_distinct`` is what a 10^10-URL deployment would keep (256
    bytes/host of mergeable state); ``exact_distinct`` is the small-SF
    verifier the oracle also computes.  Two hash aggregations:

    1. (host, bucket) -> max(rho): partial-aggregates map-side, so the
       shuffle moves at most hosts*256 rows regardless of page count.
    2. host -> estimate + exact: the exact COUNT(DISTINCT url) rides
       the same shuffle width at small SF; at production scale you
       would drop it and ship only the registers.
    """
    bucket, rho = hll_bucket_rho(url_col)
    base = pages.select(
        host_col(url_col).alias("host"),
        F.col(url_col).alias("u"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    )
    regs = base.groupBy("host", "bucket").agg(F.max("rho").alias("m"))
    sketch = regs.groupBy("host").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("z_present"),
        F.count("*").alias("b"),
    )
    zeros = F.lit(_M) - F.col("b")
    raw = F.lit(_ALPHA * _M * _M) / (F.col("z_present") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * _M)) & (zeros > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / zeros.cast("double")),
    ).otherwise(raw)
    exact = base.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("u").alias("exact_distinct"),
    )
    return (
        exact.join(F.broadcast(sketch.withColumn("est", est)), "host")
        .select(
            "host",
            F.col("n_pages").cast("bigint").alias("n_pages"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.round("est", 4).alias("est_distinct"),
            F.round(
                (F.col("est") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )
