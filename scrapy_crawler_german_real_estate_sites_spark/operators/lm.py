"""CCNet-style unigram language-model scoring (Wenzek et al. 2020).

CCNet ranks web documents by the perplexity of a small LM trained on a
trusted corpus; the head/middle/tail buckets drive what goes into the
training set.  This is the Spark-first re-expression with the LM trained
on the corpus itself (self-scoring — the trusted-corpus variant is the
same dataflow with a second input table):

  1. **Train** — one map-side-combinable token count
     (``groupBy(token).count()``), then the vocabulary is the top
     ``vocab_cap`` tokens by (count desc, token asc) via
     ``orderBy(...).limit(k)`` — Spark plans this as a distributed
     TakeOrderedAndProject, NOT a single-partition window.
     Add-one smoothing over the capped vocabulary:
     ``p(w) = (c_w + 1) / (N + V + 1)`` with ``N`` = total corpus tokens
     (including out-of-vocabulary mass) and ``V`` = kept vocab size;
     every OOV token scores ``1 / (N + V + 1)``.
  2. **Score** — tokens re-exploded and LEFT-joined against the
     **broadcast** LM (a vocabulary is Zipf-bounded and explicitly capped,
     so it broadcasts at any corpus scale — this is what keeps the hot
     Zipf-head tokens from skewing a shuffle join); OOV coalesces to the
     smoothed floor; per-doc mean negative log-likelihood and perplexity
     come from one partial-aggregable groupBy(doc_id).

Float determinism vs the DuckDB oracle: counts are exact integers, the
probabilities are identical IEEE doubles on both sides, and the per-doc
mean sums ≤ a few thousand ~O(1) doubles — round(…, 6) absorbs the
summation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("w")
    )


def train_unigram_lm(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_cap: int = 1_000_000,
):
    """Returns (lm DataFrame (w, lp), n_total, v, oov_lp).

    ``n_total``/``v``/``oov_lp`` are driver scalars from a 1-row
    aggregate — the same O(1) round-trip the BM25 operator uses for its
    corpus constants (operators/search.py).
    """
    counts = (
        _tokens(corpus, id_col, text_col).groupBy("w").agg(
            F.count("*").alias("c")
        )
    )
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("full_vocab")
    ).collect()[0]
    n_total = int(totals["n_total"] or 0)
    vocab = counts.orderBy(F.col("c").desc(), F.col("w")).limit(vocab_cap)
    # V = kept vocabulary size; with a cap below the full vocab this is
    # exactly vocab_cap, else the full vocabulary.
    v = min(int(totals["full_vocab"] or 0), vocab_cap)
    denom = float(n_total + v + 1)
    lm = vocab.select(
        "w", F.log((F.col("c") + 1.0) / F.lit(denom)).alias("lp")
    )
    import math

    return lm, n_total, v, math.log(1.0 / denom)


def unigram_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_cap: int = 1_000_000,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, nll, ppl) — mean −ln p(w) per document and its
    perplexity, under the (optionally separate) corpus's unigram LM."""
    lm, _, _, oov_lp = train_unigram_lm(
        corpus if corpus is not None else docs, id_col, text_col, vocab_cap
    )
    scored = _tokens(docs, id_col, text_col).join(
        F.broadcast(lm), "w", "left"
    )
    nll = -F.coalesce(F.col("lp"), F.lit(oov_lp))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(nll).alias("_nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("_nll"), 6).alias("nll"),
            F.round(F.exp(F.col("_nll")), 4).alias("ppl"),
        )
    )
