"""Text-analysis column functions for training-data pipelines (task brief):
language-ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting.

All native column expressions (JVM-side, codegen) with exact DuckDB-SQL
oracles — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deterministic and replicable in SQL
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}

BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def _word_count(text, word):
    return F.regexp_count(F.lower(text), F.lit(rf"\b{word}\b"))


def lang_score(text, lang):
    s = F.lit(0)
    for w in LANG_STOPWORDS[lang]:
        s = s + _word_count(text, w)
    return s


def lang_id(text):
    """argmax over per-language stopword hit counts; deterministic
    tie-break by language code order; 'unknown' when all zero."""
    langs = sorted(LANG_STOPWORDS)
    scores = [(lg, lang_score(text, lg)) for lg in langs]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("unknown")
    for lg, s in reversed(scores):
        expr = F.when(s == best, F.lit(lg)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("unknown"))


def ws_token_count(text):
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text):
    return F.regexp_count(F.lower(text), F.lit(BPE_ISH_PATTERN))


def punct_ratio(text):
    return F.round(
        F.regexp_count(text, F.lit(r"[^\w\s]")).cast("double")
        / F.greatest(F.length(text), F.lit(1)),
        6,
    )


def stopword_ratio(text):
    total = ws_token_count(text)
    hits = F.lit(0)
    for ws_ in LANG_STOPWORDS.values():
        for w in ws_:
            hits = hits + _word_count(text, w)
    return F.round(hits.cast("double") / F.greatest(total, F.lit(1)), 6)


def mean_word_len(text):
    toks = F.split(F.trim(text), r"\s+")
    return F.round(
        F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
        )
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )


def quality_score(text):
    """Composite [0,1]-ish quality heuristic: length band + low punct +
    some stopwords + sane word length.  Weights are fixed constants so the
    SQL oracle reproduces the value bit-for-bit after round(…, 6)."""
    len_ok = F.when((F.length(text) >= 50) & (F.length(text) <= 10000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.4)
    stop_ok = F.when(stopword_ratio(text) > 0.05, 1.0).otherwise(0.5)
    wl = mean_word_len(text)
    wl_ok = F.when((wl >= 3) & (wl <= 12), 1.0).otherwise(0.5)
    return F.round(
        0.3 * len_ok + 0.2 * punct_ok + 0.3 * stop_ok + 0.2 * wl_ok, 6
    )


def word_ngrams_col(text, n):
    """Word n-grams (with multiplicity — unlike dedup's distinct shingles,
    repetition metrics need occurrence counts)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def repetition_stats(docs, id_col="doc_id", text_col="text"):
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1:
    "fraction of characters in the most frequent n-gram" / "in duplicate
    n-grams") adapted to word-mass fractions over this corpus's
    newline-free docs:

    * ``dup_word_frac``   — 1 − distinct words / words (vocabulary collapse);
    * ``top_bigram`` / ``top_bigram_frac`` — the most frequent word 2-gram
      and the fraction of word positions it covers (count·2 / words);
      boilerplate/templated spam spikes this;
    * ``dup_5gram_frac``  — word mass inside 5-grams occurring more than
      once (count·5 / words, the "duplicate n-grams" signal).

    Shape at scale: three map-side-combinable groupBys keyed by
    (doc_id[, gram]) — hash-uniform, skew bounded by a single document's
    own n-gram multiset — then a broadcast-free join back on doc_id.  The
    per-doc-quadratic higher-order-function alternative (count each gram
    by filtering the array) avoids the shuffles but is O(len²) per doc —
    wrong trade at 100 TB where docs reach 10^6 tokens.  Top-gram
    tie-break is deterministic: max count, then lexicographic gram."""
    from pyspark.sql import Window

    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("txt"))
    toks = F.split(F.trim(F.lower(F.col("txt"))), r"\s+")
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        word_ngrams_col(F.col("txt"), 2).alias("g2"),
        word_ngrams_col(F.col("txt"), 5).alias("g5"),
    )
    bi = (
        base.select("doc_id", F.explode("g2").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("g"))
    top_bi = (
        bi.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("g").alias("top_bigram"), F.col("cnt").alias("top_cnt"))
    )
    dup5 = (
        base.select("doc_id", F.explode("g5").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * 5).otherwise(0)).alias(
                "dup5_mass"
            )
        )
    )
    return (
        base.select("doc_id", "n_words", "n_distinct")
        .join(top_bi, "doc_id")
        .join(dup5, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias(
                "dup_word_frac"
            ),
            "top_bigram",
            F.round(F.col("top_cnt") * 2.0 / F.col("n_words"), 6).alias(
                "top_bigram_frac"
            ),
            F.round(F.col("dup5_mass") / F.col("n_words"), 6).alias("dup_5gram_frac"),
        )
    )


def fingerprint(text, n=5):
    """Document fingerprint: md5 of whitespace-normalized text, plus a
    winnowing-style min-shingle-hash (robust to small edits)."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    toks = F.split(norm, " ")
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n))),
    )
    return F.md5(norm).alias("md5_fp"), F.array_min(shingle_hashes).alias("min_shingle_fp")


# ---------------------------------------------------------------------------
# PII redaction (emails / IPv4 / phone-length digit runs)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and DuckDB's RE2 interpret
# identically (character classes, bounded repeats, ASCII \b / \d — no
# lookarounds, no backrefs) so the DuckDB oracle mirrors byte-for-byte.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\b\d{7,15}\b"


def redact_pii(text):
    """Scrub emails, IPv4 addresses and phone-length digit runs from a text
    column, in that order (emails first so their local parts can't later
    match as digit runs; IPv4 before phone — octets are ≤3 digits so the
    phone pattern can't eat an address, but a redacted ``<IP>`` token must
    not leave digit fragments behind).  Pure ``regexp_replace`` chain:
    JVM-side, codegen'd, embarrassingly row-local — the 100 TB cost is one
    corpus pass with zero shuffle."""
    step = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    step = F.regexp_replace(step, PII_IPV4, "<IP>")
    return F.regexp_replace(step, PII_PHONE, "<PHONE>")


def pii_counts(text):
    """(n_emails, n_ips, n_phones) count columns over the ORIGINAL text.
    The three patterns are mutually non-overlapping on real text (emails
    carry no standalone \\b-delimited digit runs; IPv4 octets are too
    short for the phone pattern), so counting before redaction is
    order-independent — and therefore safe to mirror in SQL."""
    return (
        F.regexp_count(text, F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IPV4)).cast("bigint").alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PHONE)).cast("bigint").alias("n_phones"),
    )


def chunk_docs(docs, chunk_size=64, overlap=16, id_col="doc_id", text_col="text"):
    """Fixed-token chunking with overlap — the sequence-prep step that
    turns variable-length documents into model-sized windows (training
    sample packing's upstream, RAG indexing's unit).  Chunk ``i`` covers
    whitespace tokens ``[i·step, i·step + chunk_size)`` with
    ``step = chunk_size − overlap``; starts run while they point inside
    the document, so every token lands in ≥1 chunk and consecutive chunks
    share ``overlap`` tokens.

    Pure row-local higher-order expressions (sequence → slice →
    concat_ws + one posexplode): zero shuffle, embarrassingly parallel,
    output size = input × (1 + overlap/step) — the 100 TB cost is one
    corpus pass.  Returns (doc_id, chunk_id, chunk_text, n_chunk_tokens).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # last start: the largest multiple of step strictly below n
    n_chunks = F.floor((n - F.lit(1)) / F.lit(step)) + F.lit(1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * step + 1, chunk_size)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "chunk_text",
        F.size(F.split("chunk_text", r"\s+")).cast("bigint").alias("n_chunk_tokens"),
    )
