"""Gopher-style composite quality filter (Rae et al. 2021, §A1.1).

The reference crawler has per-item validity gates (D8:
``/root/reference/demo_crawl/pipelines.py`` adresse/kosten checks); a
training-data pipeline generalizes that idea to document-level quality
rules.  This operator composes the engine's existing text signals
(``functions/textops.py``) into a keep/drop decision with the FIRST
failing rule named — the standard shape for filter-audit dashboards,
where you need to know *why* mass is dropped, not just how much.

Rules, in evaluation order (first failure wins):

  1. ``too_short``   — fewer than ``min_words`` whitespace tokens;
  2. ``word_len``    — mean word length outside [min_mwl, max_mwl]
                       (gibberish / boilerplate indicator);
  3. ``no_stopwords``— zero stopword hits across all language lists
                       (Gopher's "must contain stop words" rule);
  4. ``dup_words``   — 1 − distinct/total words above ``max_dup_word``
                       (vocabulary collapse);
  5. ``top_bigram``  — most-frequent-bigram word mass above
                       ``max_top_bigram`` (templated spam);
  6. ``dup_5gram``   — word mass in repeated 5-grams above
                       ``max_dup_5gram`` (boilerplate blocks);
  else ``ok`` and ``keep = true``.

Scale shape: the repetition signals reuse
``textops.repetition_stats`` (three map-side-combinable groupBys keyed
by (doc_id[, gram]), skew bounded by a single document); the row-local
signals (mean word length, stopword ratio) are pure column expressions.
The final join is doc_id⋈doc_id — hash-uniform, co-partitioned with the
repetition aggregation's own exchange.  No UDFs, no driver round-trips.
Thresholds compare the round(…, 6) values so the DuckDB oracle is
bit-for-bit reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scrapy_crawler_german_real_estate_sites_spark.functions.textops import (
    mean_word_len,
    repetition_stats,
    stopword_ratio,
)

# Threshold defaults are fitted to the synthetic corpus so the filter
# produces a nontrivial keep/drop mix at every tier (Gopher's published
# values assume natural web text; see tests/test_quality.py for planted
# violators of each rule).
DEFAULTS = {
    "min_words": 20,
    "min_mwl": 3.0,
    "max_mwl": 10.0,
    "max_dup_word": 0.6,
    "max_top_bigram": 0.125,
    "max_dup_5gram": 0.15,
}


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **overrides,
) -> DataFrame:
    """(doc_id, n_words, keep, reason) — first failing rule, else 'ok'."""
    th = {**DEFAULTS, **overrides}
    rep = repetition_stats(docs, id_col=id_col, text_col=text_col)
    row_local = docs.select(
        F.col(id_col).alias("doc_id"),
        mean_word_len(F.col(text_col)).alias("mwl"),
        stopword_ratio(F.col(text_col)).alias("swr"),
    )
    j = rep.join(row_local, "doc_id")
    reason = (
        F.when(F.col("n_words") < th["min_words"], F.lit("too_short"))
        .when(
            (F.col("mwl") < th["min_mwl"]) | (F.col("mwl") > th["max_mwl"]),
            F.lit("word_len"),
        )
        .when(F.col("swr") <= 0.0, F.lit("no_stopwords"))
        .when(F.col("dup_word_frac") > th["max_dup_word"], F.lit("dup_words"))
        .when(
            F.col("top_bigram_frac") > th["max_top_bigram"], F.lit("top_bigram")
        )
        .when(
            F.col("dup_5gram_frac") > th["max_dup_5gram"], F.lit("dup_5gram")
        )
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "doc_id",
        "n_words",
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason") == "ok")


# ---------------------------------------------------------------------------
# compression-ratio signal (round 4)
# ---------------------------------------------------------------------------


def compression_ratio(
    df, id_col: str = "doc_id", text_col: str = "text",
    min_ratio: float = 0.30, max_ratio: float = 1.05,
) -> "DataFrame":
    """DEFLATE-compressibility quality signal — the corpus-hygiene rule
    several public LLM-data pipelines apply alongside the Gopher rules
    (e.g. Dolma's "document compression ratio" filter; RefinedWeb's
    near-duplicate-line proxies are the same intuition): machine-
    generated/templated text compresses far below natural prose, and
    adversarial noise barely compresses at all.

    Emits (id, n_bytes, n_compressed, ratio, keep) where ``ratio`` =
    compressed/uncompressed over the UTF-8 bytes (zlib level 6,
    deterministic) and ``keep`` = ratio in [min_ratio, max_ratio] —
    band defaults follow the published practice of dropping only the
    extremes.

    Scale shape: one Arrow ``mapInPandas`` pass (zlib is per-row
    imperative work — the designated slow-path budget, same as the
    multimodal/WARC decoders), zero shuffle, output O(rows) narrow.
    No DuckDB oracle by design: DuckDB exposes no DEFLATE; the pytest
    pins a python-zlib mirror instead (`tests/test_quality.py`)."""
    import zlib
    from typing import Iterator

    import pandas as pd

    lo, hi = float(min_ratio), float(max_ratio)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, nc, ratio, keep = [], [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, 6)
                r = (len(comp) / len(raw)) if raw else 1.0
                ids.append(i)
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(round(r, 6))
                keep.append(lo <= r <= hi)
            yield pd.DataFrame({
                id_col: ids, "n_bytes": nb, "n_compressed": nc,
                "ratio": ratio, "keep": keep,
            })

    schema = (f"{id_col} {dict(df.dtypes)[id_col]}, n_bytes long, "
              "n_compressed long, ratio double, keep boolean")
    return df.select(id_col, text_col).mapInPandas(run, schema)
