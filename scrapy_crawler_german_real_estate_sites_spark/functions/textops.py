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
