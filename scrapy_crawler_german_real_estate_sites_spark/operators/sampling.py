"""Deterministic dataset splitting / sampling for training-data curation.

A training pipeline over a 100 TB corpus needs splits that are:

* **per-row independent** — no shuffle, no global sort, no state: the
  split of a document is a pure function of its id, so the assignment is
  embarrassingly parallel and identical no matter how the corpus is
  partitioned, re-partitioned, or re-read;
* **stable under growth** — adding documents never moves an existing
  document between splits (hash threshold, not modulo-of-rank);
* **auditable** — the realized per-stratum proportions are one
  map-side-combinable aggregation away.

``split_col`` hashes a salted id with md5 and compares the first 8 hex
chars (32 bits, uniform under md5) against the valid-fraction threshold.
md5 is identical across Spark, DuckDB, and python's hashlib, which keeps
the assignment oracle-checkable byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the md5 — uniform on [0, 2^32)
_BUCKETS = 1 << 32


def split_threshold_hex(valid_frac: float) -> str:
    """The 8-hex-digit threshold below which a row is 'valid'.

    Clamped to the 8-hex-digit range: valid_frac=1.0 would otherwise
    produce the 9-char string '100000000', which every 8-char md5 prefix
    sorts *after* lexicographically — assigning only ~1/16 of rows to
    'valid'. The clamp keeps the threshold at 'ffffffff'; the strict
    ``<`` compare is widened to ``<=`` at exactly 1.0 by ``split_col``.
    """
    if not 0.0 <= valid_frac <= 1.0:
        raise ValueError(f"valid_frac must be in [0,1], got {valid_frac}")
    return format(min(int(valid_frac * _BUCKETS), _BUCKETS - 1), "08x")


def split_col(id_col, valid_frac: float, salt: str = "split-v1") -> Column:
    """'train' / 'valid' assignment as a pure column expression.

    The salt namespaces the split: a different salt draws an independent
    split from the same ids (e.g. one for valid, one for test), and
    versioning the salt re-rolls the assignment on purpose — never by
    accident."""
    if valid_frac >= 1.0:
        # Threshold is clamped to 'ffffffff'; a strict < would miss the
        # hashes equal to it, so the degenerate all-valid split is exact.
        return F.lit("valid")
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return F.when(
        F.substring(h, 1, 8) < F.lit(split_threshold_hex(valid_frac)),
        F.lit("valid"),
    ).otherwise(F.lit("train"))


def dataset_split(
    docs: DataFrame,
    valid_frac: float = 0.05,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Per-stratum split audit: (stratum, split, docs) counts.

    The assignment itself is row-local (no shuffle); the only exchange is
    the audit groupBy on (stratum, split) — cardinality = strata x 2, so
    the shuffle moves partial counts, never rows."""
    s = docs.withColumn("split", split_col(id_col, valid_frac, salt))
    key = [strata_col, "split"] if strata_col else ["split"]
    return s.groupBy(*key).agg(F.count("*").alias("docs"))


def domain_cap(
    docs, group_col="source", k=3, order_col="n_chars", id_col="doc_id",
):
    """Per-domain quota capping — the crawl-balance operator that keeps a
    handful of mega-domains from dominating a training corpus (the C4 /
    RefinedWeb "cap documents per registered domain" step): keep the top
    ``k`` documents per ``group_col``, ranked by ``order_col`` descending
    with ``id_col`` as the deterministic tie-break.

    Plan shape: a rank-filter window that Spark executes as
    WindowGroupLimit — the per-partition top-k is pre-filtered map-side
    BEFORE the exchange (each task forwards at most k rows per group), so
    the shuffle moves O(groups × k) rows, not the corpus; a hot domain
    costs its k survivors, not its million members."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).desc(), F.col(id_col))
    )
    return (
        docs.select(id_col, group_col, order_col)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.6,
    budget: int = 60_000,
    group_col: str = "source",
    id_col: str = "url",
    salt: str = "mix-v1",
    audit: bool = True,
) -> DataFrame:
    """Temperature-based source rebalancing — the data-mixing step that
    keeps a handful of mega-sources from dominating a training corpus
    while still over-sampling the long tail (the multinomial
    ``p_s ∝ n_s^alpha`` recipe of Lample & Conneau 2019 / common-crawl
    curriculum mixes; ``alpha=1`` reproduces natural proportions,
    ``alpha=0`` uniform).

    Per-source keep fraction: ``frac_s = min(1, budget * w_s / n_s)`` with
    ``w_s = n_s^alpha / Σ n_s^alpha``; each row keeps independently when
    the 32-bit prefix of ``md5(salt || id)`` falls under the fraction —
    the same salted-hash primitive as ``dataset_split``, so membership is
    deterministic, stable under corpus growth, and engine-portable.

    Cross-engine determinism: ``frac_s`` is rounded to 9 decimals BEFORE
    the threshold compare on both engines, so a 1-ulp ``pow``/sum
    difference between Java and C libm can't flip a row; the threshold is
    the fraction scaled to 2^32, floored, and formatted as the 8-hex-char
    string the hash prefix compares against lexicographically (with the
    ``frac >= 1`` clamp short-circuiting the compare — the degenerate
    '100000000' 9-char threshold never forms).

    Scale shape: the per-source dimension is O(sources) rows (one
    map-side-combinable count), broadcast back onto the corpus; the keep
    decision is a row-local hash compare (zero shuffle over the corpus);
    the audit is a second map-side-combinable rollup.  Returns the
    per-source audit (source, n_docs, weight, keep_frac, n_kept) when
    ``audit=True``, else the kept rows themselves.
    """
    counts = docs.groupBy(group_col).agg(
        F.count("*").cast("double").alias("n_docs")
    )
    pows = counts.withColumn("p", F.pow("n_docs", F.lit(alpha)))
    tot = pows.agg(F.sum("p").alias("tp"))
    dims = (
        pows.crossJoin(F.broadcast(tot))
        .withColumn("weight", F.col("p") / F.col("tp"))
        .withColumn(
            "keep_frac",
            F.least(
                F.lit(1.0),
                F.round((F.lit(float(budget)) * F.col("weight")) / F.col("n_docs"), 9),
            ),
        )
        .withColumn(
            "thr",
            F.format_string(
                "%08x", F.floor(F.col("keep_frac") * F.lit(float(_BUCKETS))).cast("bigint")
            ),
        )
    )
    keyed = docs.join(F.broadcast(dims), group_col)
    keep = (F.col("keep_frac") >= 1.0) | (
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col))), 1, 8)
        < F.col("thr")
    )
    if not audit:
        return keyed.where(keep).drop("n_docs", "p", "tp", "weight", "keep_frac", "thr")
    return (
        keyed.withColumn("kept", keep.cast("int"))
        .groupBy(group_col)
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.max("weight").alias("weight"),
            F.max("keep_frac").alias("keep_frac"),
            F.sum("kept").cast("bigint").alias("n_kept"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    n: int = 20,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Exact-``n`` per-stratum uniform sample, deterministic and portable.

    Rows rank within their stratum by ``md5(salt || id)`` — a uniform
    permutation under md5 — and the first ``n`` survive, i.e. a
    without-replacement draw whose membership is a pure function of
    (salt, id): identical across partitionings, re-reads, and engines
    (md5 hexes the same in Spark, DuckDB, and hashlib), and adding a new
    salt draws an independent sample.

    Plan shape: the rank-filter compiles to WindowGroupLimit (same as
    ``domain_cap``) — every map task forwards at most ``n`` rows per
    stratum BEFORE the exchange, so the shuffle moves O(strata × n) rows,
    never the corpus.  When only a *fraction* is needed, use
    ``split_col`` instead: that one is row-local with zero shuffle;
    exactness of the count is what buys the rank here.
    """
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(strata_col, id_col)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= n)
    )


def shard_pack(
    docs: DataFrame,
    budget: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack-v1",
    bucket_hex_len: int = 2,
) -> DataFrame:
    """Token-budget shard packing — assign each document to a training
    shard so consecutive shards hold ~``budget`` whitespace tokens each
    (the "pack the corpus into fixed-token shards/sequences" step of every
    LLM training pipeline).  Documents are laid out in a deterministic
    shuffled order (md5 of the salted id — a uniform permutation, so
    shards are i.i.d. slices of the corpus, not source-ordered runs) and
    ``shard_id = floor(tokens_before / budget)``: a shard closes once the
    running total crosses the budget, the straddling document starting the
    next one.

    The SEMANTIC spec is one global running sum over the md5 order — a
    single-partition window at 100 TB, i.e. a non-starter.  This
    implementation is the scale-correct two-pass prefix sum:

      1. bucket every row by the first ``bucket_hex_len`` hex chars of its
         key (the buckets partition the global order into 16^len ordered
         ranges, because the bucket is a PREFIX of the sort key);
      2. one map-side-combinable groupBy computes per-bucket token totals
         — a 16^len-row dimension — and a window over THAT dim (tiny by
         construction: 256 rows at the default) turns totals into
         bucket-start offsets;
      3. the offsets broadcast-join back and a window PARTITIONED BY
         bucket (parallel, skew-free: md5 buckets are uniform) finishes
         the within-bucket running sum; global = offset + local.

    Net cost over the corpus: one hash exchange on bucket + one broadcast
    — no global sort, no single-partition stage.  Raise ``bucket_hex_len``
    until a bucket fits a partition (3 hex chars = 4096 buckets, etc.).
    The DuckDB oracle states the one-window semantic spec directly; this
    dataflow must (and does) reproduce it bit-for-bit."""
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    from scrapy_crawler_german_real_estate_sites_spark.functions.textops import (
        ws_token_count,
    )

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        ws_token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        key.alias("key"),
    ).withColumn("bucket", F.substring("key", 1, bucket_hex_len))
    totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    # 16^bucket_hex_len rows: the unpartitioned window is over the tiny
    # dimension, never the corpus
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("btot").over(wb), F.lit(0)).alias("boff")
    )
    wl = (
        Window.partitionBy("bucket")
        .orderBy("key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), "bucket")
        .withColumn("cum_incl", F.sum("n_tokens").over(wl))
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (F.col("boff") + F.col("cum_incl") - F.col("n_tokens"))
                / F.lit(float(budget))
            ).cast("bigint").alias("shard_id"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    (IPL 2006): each row draws key = u^(1/w) from a deterministic
    uniform u, and the k largest keys ARE a weight-proportional sample
    without replacement.  The one-pass/top-k formulation is the whole
    point at corpus scale: no global sort, no rejection loop — the plan
    is a map expression + TakeOrderedAndProject, and the same keys
    merge across partitions, days, or engines (the md5-derived u makes
    the draw reproducible anywhere, including the DuckDB oracle).

    u comes from a 60-bit md5 fraction, offset by half an ulp so u > 0;
    rows with non-positive weight never win (key -1).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.pow(u, F.lit(1.0) / w)).otherwise(F.lit(-1.0))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(weight_col).cast("bigint").alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(k)
    )
