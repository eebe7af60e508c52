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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-exchange the NARROW raw input before the heavy per-row
    expressions (shingling, per-token md5, hyperplane dots).

    Why: Catalyst evaluates projection expressions in the stage below the
    first exchange — i.e. inside the scan stage.  A scan's parallelism is
    bounded by its splittable units, and real corpora routinely arrive as
    few/giant/skew-sized files or single-row-group parquet (this sandbox's
    testdata is exactly that), which would serialize the expensive
    projection onto a handful of cores.  These operators all shuffle
    anyway (self-joins on shingle/bucket keys), so one extra linear,
    hash-uniform exchange of (id, text) bytes is noise next to the
    expression cost it parallelizes — measured 2-4x wall-time at sf0.1."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, key)


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a multi-consumer expensive subtree (shingle relation,
    fingerprint relation) exactly once.

    Catalyst's ReusedExchange would in principle share one shuffle across
    the self-join sides and join-backs, but under AQE the reuse is not
    guaranteed — the executed simhash plan showed SIX parquet scans and
    zero ReusedExchange nodes, i.e. the whole fingerprint computation ran
    once per consumer (28s vs 11s at sf0.1).  An eager localCheckpoint
    pins the relation as executor-local blocks (same pattern as the crawl
    engine's per-wave frontier pins, plans/crawl.py) — at 100 TB this is
    the difference between one corpus pass and one per consumer; the
    pinned relation itself is the NARROW (id, signature) projection, not
    the corpus."""
    return df.localCheckpoint(eager=True)


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
    raw = _spread(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt")), "id"
    )
    sh = raw.select("id", F.explode(shingles_col(F.col("txt"), n)).alias("sh"))
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
    # layout: scan → exchange(id) [_spread: un-serialize the scan stage]
    # → Project(shingles, parallel) → exchange(id) → _pin.  The pinned
    # shingle relation feeds all 3 consumers (signature branch + BOTH
    # exact-verify join sides) without re-evaluating the heavy
    # higher-order transform per branch (see _pin: AQE does not reliably
    # give ReusedExchange here).
    # The null-text guard runs on the RAW column pre-spread; the previous
    # where(size(shs) > 0) was equivalent (shingles_col never yields an
    # empty array, only NULL for NULL text) but predicate pushdown rewrote
    # it into a full second evaluation of the shingle expression inside
    # the single-task scan stage.
    with_sh = (
        _spread(
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
            .where(F.col("txt").isNotNull()),
            "id",
        )
        .select("id", shingles_col(F.col("txt"), n).alias("shs"))
        .repartition(par, "id")
    )
    with_sh = _pin(with_sh)
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

def simhash_fingerprint(docs: DataFrame, bits=60, word_bits=15, id_col="doc_id",
                        text_col="text") -> DataFrame:
    """Per-doc ``bits``-wide SimHash packed into ONE BIGINT (id, sv).

    Charikar-style fingerprint: per distinct token, a ``bits``-wide hash
    (first bits/4 md5 hex chars → 60 bits always fits a signed long);
    per-bit sign-sum over the doc's tokens; bit set iff the sum is > 0.

    Expression-shape notes (measured at sf0.1/local[32]):
    * per-token bits come from ONE ``bin()``/``lpad``/``split`` per token
      (string ops whole-stage codegen'd), NOT a per-(token,bit) shift —
      and the sign-sums accumulate in a single ``aggregate`` pass with a
      ``zip_with`` add.  An unrolled 60-column groupBy-sum formulation is
      algebraically identical but compiles a pathological plan (20s of
      codegen/planning for 2s of data); this tree is small and runs 2.4s.
    * packing must NOT sum 2^b terms in double: a 60-bit sum spans more
      than the 53-bit mantissa and silently drops low bits.  Pack each
      ``word_bits``-bit word exactly (sums < 2^15 are integer-exact in
      double), then combine words with literal-shift ``shiftleft`` +
      ``bitwiseOR`` in the long domain.
    Packing keeps every downstream shuffle (banding, pair distinct,
    verify) at 8 bytes/row, and hamming becomes ``bit_count(XOR)``."""
    hv = F.transform(
        F.array_distinct(tokens_col(F.col("txt"))),
        lambda t: F.conv(F.substring(F.md5(t), 1, bits // 4), 16, 10).cast("long"),
    )
    base = (
        _spread(docs.select(F.col(id_col).alias("id"),
                            F.col(text_col).alias("txt")), "id")
        .select("id", hv.alias("hv"))
        .repartition(docs.sparkSession.sparkContext.defaultParallelism, "id")
    )
    # reverse(lpad(bin(h))) puts bit b at array index b+1 (1-based)
    signs = lambda h: F.transform(
        F.split(F.reverse(F.lpad(F.bin(h), bits, "0")), ""),
        lambda c: F.when(c == "1", 1).otherwise(-1),
    )
    counts = F.aggregate(
        F.col("hv"),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, signs(h), lambda a, s: a + s),
    )
    base = base.select("id", counts.alias("cnt"))
    word = lambda w: F.aggregate(
        F.zip_with(
            F.slice(F.col("cnt"), w * word_bits + 1, word_bits),
            F.sequence(F.lit(0), F.lit(word_bits - 1)),
            lambda c, b: F.when(c > 0, F.pow(F.lit(2.0), b.cast("double")))
            .otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    ).cast("long")
    sv = None
    for w in range(bits // word_bits):
        term = F.shiftleft(word(w), w * word_bits)
        sv = term if sv is None else sv.bitwiseOR(term)
    return base.select("id", sv.alias("sv"))


def dedup_simhash(
    docs: DataFrame, bits=60, max_hamming=3, id_col="doc_id", text_col="text"
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.

    Web-scale shape per Manku/Jain/Das Sarma (WWW'07, "Detecting
    Near-Duplicates for Web Crawling"): a wide (60-bit) fingerprint with
    block-banding — with ``max_hamming + 1`` bands, any pair within the
    distance budget shares ≥1 exact band (pigeonhole) → full recall via a
    bucket equi-join instead of all-pairs.  Wide bands (15 bits → 32k
    buckets/band) keep collision buckets small on templated corpora where
    a narrow (8-bit) band space degenerates into giant buckets and a
    quadratic candidate explosion.  Candidates verify with
    bit_count(sv_a XOR sv_b) on the packed longs."""
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    par = docs.sparkSession.sparkContext.defaultParallelism
    # ONE pinned (id, sv) relation keyed by the signature: the
    # identical-signature self-join sides, the distinct-signature reps,
    # and both inter-cluster member join-backs all read the materialized
    # blocks (see _pin)
    bysv = _pin(
        simhash_fingerprint(docs, bits, band_bits, id_col, text_col).repartition(
            par, "sv"
        )
    )
    # (1) identical fingerprints — on templated web corpora MOST near-dup
    # pairs are exact-signature dups; emit them with a single equi-join on
    # sv (each pair produced exactly once: no banding fan-out, no distinct)
    intra = (
        bysv.alias("a")
        .join(bysv.alias("b"), "sv")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    # (2) banding over DISTINCT signatures only (Manku et al.'s cluster
    # trick): the candidate space is signature pairs, not doc pairs, so a
    # 1000-doc dup cluster costs ONE row here instead of 10^6 candidates
    reps = bysv.select("sv").distinct()
    banded = (
        reps.select(
            "sv",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sv"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bucket"),
                    )
                    for b in range(n_bands)
                ])
            ).alias("bb"),
        )
        .select("sv", "bb.band", "bb.bucket")
        .repartition(par, "band", "bucket")
    )
    # long: DuckDB's bit_count is cast to BIGINT in the oracle — keep the
    # driver's type-sensitive value hash aligned
    sv_pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.sv") < F.col("b.sv"))
        .select(F.col("a.sv").alias("sva"), F.col("b.sv").alias("svb"))
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sva").bitwiseXOR(F.col("svb"))).cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    # expand qualifying signature pairs back to member doc pairs
    inter = (
        sv_pairs.join(
            bysv.select(F.col("sv").alias("sva"), F.col("id").alias("ia")), "sva"
        )
        .join(bysv.select(F.col("sv").alias("svb"), F.col("id").alias("ib")), "svb")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    return intra.unionByName(inter)


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


# ---------------------------------------------------------------------------
# 7. cross-corpus line dedup (C4-style boilerplate removal)
# ---------------------------------------------------------------------------

def line_dedup(
    docs: DataFrame, id_col="doc_id", text_col="text", min_words: int = 5,
    carry_cols=("lang",),
) -> DataFrame:
    """C4-recipe corpus-level line deduplication (Raffel et al. 2020 §2.2 /
    Dodge et al. 2021): a line that occurs in more than one document is
    boilerplate (nav bars, footers, cookie banners) — keep only its FIRST
    occurrence corpus-wide and drop every other copy, then reassemble the
    documents.  Lines shorter than ``min_words`` words are always kept
    (too short to be meaningful boilerplate; dropping every blank line of
    every doc but one would mangle formatting, not remove boilerplate).

    Deterministic keeper rule: the occurrence with the smallest
    ``(doc_id, line_position)`` — encoded as ``doc_id * 1_000_000 + pos``
    so a single BIGINT ``min`` (map-side combinable) picks it (documents
    with ≥1M lines would need a wider encoding; no real corpus has them).

    Scale shape: two equi-shuffles, both skew-safe.  The keeper table is
    a partial-aggregatable ``groupBy(line).min`` — a billion-copy hot line
    ("Accept cookies") collapses map-side to one row per task before the
    exchange.  The join-back on ``line`` is a sort-merge equi-join whose
    hot keys AQE's skew-join splitting handles (a window over
    ``partitionBy(line)`` — the obvious alternative — would NOT be
    skew-safe: every copy of the hot line lands in one task).  Reassembly
    groups by ``id_col``, bounded by a single document.

    Returns one row per surviving document: (doc_id, <carry_cols>,
    text_dedup, n_kept, n_dropped).  Documents whose every line was a
    dropped duplicate disappear (nothing left to emit).
    """
    carry = [c for c in carry_cols if c in docs.columns]
    lines = docs.select(
        id_col, *carry,
        F.size(F.split(F.col(text_col), "\n")).cast("bigint").alias("n_lines"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn(
        "longline",
        F.size(F.filter(F.split("line", " "), lambda x: x != "")) >= min_words,
    ).withColumn("occ", F.col(id_col) * F.lit(1_000_000) + F.col("pos"))

    keep = (
        lines.where("longline")
        .groupBy("line")
        .agg(F.min("occ").alias("keep_occ"))
    )
    kept = (
        lines.join(keep, "line", "left")
        .where((~F.col("longline")) | (F.col("occ") == F.col("keep_occ")))
    )
    return (
        kept.groupBy(id_col)
        .agg(
            *[F.max(c).alias(c) for c in carry],
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("text_dedup"),
            F.count("*").cast("bigint").alias("n_kept"),
            F.max("n_lines").alias("n_lines"),
        )
        .select(
            id_col, *carry, "text_dedup", "n_kept",
            (F.col("n_lines") - F.col("n_kept")).alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# 8. normalized exact dedup (case/punct/whitespace-insensitive)
# ---------------------------------------------------------------------------

def normalized_text_col(text):
    """Canonical form for near-exact matching: lowercase, strip everything
    that is not a letter/digit/whitespace (unicode classes), collapse
    whitespace runs, trim.  Pure column expression — JVM-side, and
    byte-for-byte mirrorable in DuckDB (RE2 shares ``\\p{L}``/``\\p{N}``)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}\s]", ""),
            r"\s+", " ",
        )
    )


def dedup_normalized(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Exact dedup over the normalized text: catches the trivially-edited
    copies exact dedup misses (case changes, punctuation, reflowed
    whitespace) without any pairwise similarity machinery.  Same scale
    shape as ``dedup_exact``: one map-side-combinable groupBy on the
    normalized-text hash.  Returns (cluster_key, keep_id, n_copies)."""
    return (
        docs.groupBy(F.md5(normalized_text_col(F.col(text_col))).alias("cluster_key"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# 9. duplicated-substring detection (Lee et al. 2021 ExactSubstr family)
# ---------------------------------------------------------------------------

def substring_dedup(
    docs: DataFrame, id_col="doc_id", text_col="text", window: int = 12,
) -> DataFrame:
    """Duplicated-substring mass per document — the distributed form of the
    ExactSubstr criterion (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better"): any ``window``-token span whose exact
    text occurs anywhere earlier in the corpus is duplicated content.
    The suffix-array formulation is inherently single-machine; the
    shuffle-friendly equivalent is rolling window hashes — every doc emits
    one md5 per token position, the corpus-wide first occurrence of each
    hash (min ``(doc_id, pos)``, the same BIGINT encoding as
    ``line_dedup``) is the keeper, and every other occurrence marks its
    ``window`` tokens as duplicated.

    Overlapping duplicated windows are merged by a per-document interval
    union — ``least(window, pos - lag(pos))`` summed over the sorted
    duplicate positions — so the reported ``dup_tokens`` is the union
    length, not a double-count.  The standard policy downstream is "drop
    documents with ``dup_frac`` above a threshold" (removal by span
    surgery would splice unrelated text together; Lee et al. §4 notes the
    same caveat).

    Scale shape: window hashing is row-local (one md5 per token — at
    100 TB this is the dominant compute, embarrassingly parallel); the
    keeper groupBy is map-side combinable (a boilerplate span repeated a
    billion times collapses per task); the join-back is an
    AQE-skew-splittable equi-join; the interval-union window is
    partitioned by document, so its skew is bounded by a single doc.

    Returns one row per input document:
    (doc_id, n_tokens, n_windows, n_dup_windows, dup_tokens, dup_frac).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    base = (
        docs.select(id_col, toks.alias("toks"))
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
        .withColumn(
            "n_windows",
            F.greatest(F.lit(0), F.col("n_tokens") - F.lit(window - 1)).cast("bigint"),
        )
    )
    wins = (
        base.where(F.col("n_tokens") >= window)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_tokens") - F.lit(window)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i + 1, window))),
                )
            ).alias("pos", "h"),
        )
        .withColumn("occ", F.col(id_col) * F.lit(1_000_000) + F.col("pos"))
    )
    keep = wins.groupBy("h").agg(F.min("occ").alias("keep_occ"))
    dup = wins.join(keep, "h").where(F.col("occ") != F.col("keep_occ"))

    w = Window.partitionBy(id_col).orderBy("pos")
    covered = dup.withColumn(
        "contrib",
        F.least(F.lit(window), F.col("pos") - F.lag("pos").over(w)),
    ).withColumn("contrib", F.coalesce("contrib", F.lit(window)))
    per_doc = covered.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_dup_windows"),
        F.sum("contrib").cast("bigint").alias("dup_tokens"),
    )
    return (
        base.select(id_col, "n_tokens", "n_windows")
        .join(per_doc, id_col, "left")
        .select(
            id_col, "n_tokens", "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.greatest(F.lit(1), F.col("n_tokens")).cast("double")
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# 7. SemDeDup — k-means-blocked semantic dedup (Abbas et al. 2023)
# ---------------------------------------------------------------------------

def semdedup(
    emb: DataFrame, threshold=0.95, ncentroids=8,
    id_col="vec_id", vec_col="embedding",
) -> DataFrame:
    """Semantic dedup over an embedding column, SemDeDup-style
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): cluster the corpus with k-means,
    compare pairs ONLY within a cluster, and drop every member that has a
    within-cluster neighbor above the cosine threshold with a smaller id
    (the paper keeps one representative per semantic-duplicate group; the
    min-id rule is the deterministic materialization of that choice — the
    keeper set is exactly the set with no lower-id near neighbor, so no
    two keepers in the same cluster are within ``threshold`` of each
    other).

    Returns the DROP list: (vec_id, cid, dup_of, cosine) where ``dup_of``
    is the smallest-id qualifying neighbor (the audit trail: which keeper
    displaced this row) and ``cosine`` that witness pair's similarity.

    Scale shape: the coarse quantizer is ``similarity.assign_centroids``
    (deterministic seed + one Lloyd step, centroids broadcast — k rows);
    candidate generation is a cid⋈cid equi self-join, so the pairwise
    cosine bill is Σ|cluster|² instead of |corpus|² — at 100 TB you pick
    ``ncentroids`` so the expected cluster fits a partition (the paper
    also caps per-cluster comparisons; skew in a hot cluster is bounded
    the same way: raise k).  Unlike ``dedup_embedding_cosine``'s
    hyperplane-LSH blocking (recall by OR-amplification probability),
    k-means blocking trades a small recall loss at cluster borders for
    zero repeated hashing passes — both are first-class; this one is the
    published SemDeDup dataflow."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.similarity import (
        assign_centroids,
    )

    assigned, _ = assign_centroids(
        emb, ncentroids=ncentroids, id_col=id_col, vec_col=vec_col, refine=1
    )
    a = assigned.select(
        F.col("cid"), F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        F.col("cid"), F.col("vec_id").alias("id_b"), F.col("v").alias("vb")
    )
    # cid equi-join + id_a < id_b: each unordered within-cluster pair once
    dots = (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                F.aggregate(
                    F.zip_with("va", "vb", lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x,
                )
                / (
                    F.sqrt(F.aggregate("va", F.lit(0.0), lambda s, x: s + x * x))
                    * F.sqrt(F.aggregate("vb", F.lit(0.0), lambda s, x: s + x * x))
                ),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
    )
    # the dropped row is the larger id; witness = its smallest near keeper
    w = Window.partitionBy("cid", "id_b").orderBy(F.asc("id_a"))
    return (
        dots.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("id_b").alias("vec_id"),
            "cid",
            F.col("id_a").alias("dup_of"),
            "cosine",
        )
    )
