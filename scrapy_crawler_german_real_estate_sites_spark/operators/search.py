"""Keyword relevance search over the document corpus: BM25 top-k.

Training-data pipelines use lexical scoring both for targeted corpus
queries ("find the docs about X") and as a quality/topicality signal when
assembling domain mixes.  BM25 (Robertson/Spärck Jones probabilistic
relevance framework — the Okapi formulation) is the standard.

Shape at scale (the inverted-index dataflow, expressed relationally):

* ONE corpus pass: tokenize, take the doc length, and keep only the
  query-term hits via an array-level ``F.filter`` — the explode then
  generates |postings| rows, not |corpus tokens| rows (Catalyst cannot
  hoist a post-explode ``isin`` above the Generate, so filtering inside
  the array is the difference between shuffling the postings lists and
  materializing every token in the corpus);
* that narrow (doc_id, dl, hits) relation is lazily checkpointed so the
  corpus-scalar aggregate and the scoring job share the scan instead of
  re-tokenizing per consumer;
* corpus scalars (N, avgdl) are a 1-row aggregate collected to the
  driver and folded in as literals — on a cluster this is a single-row
  action, vs. rebuilding a broadcast (and re-running its whole subtree)
  at every use site;
* term statistics (document frequency → IDF) are a |Q|-row relation,
  broadcast to the scoring join;
* the final top-k is a global sort of per-doc scores LIMIT k — Spark
  plans this as TakeOrderedAndProject (per-partition heaps + driver
  merge), not a full sort.

All native expressions; scores rounded to 6 so the DuckDB oracle's libm
and the JVM's agree bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame, query_terms, k=10, k1=1.2, b=0.75,
    id_col="doc_id", text_col="text",
) -> DataFrame:
    """Top-``k`` docs by BM25 score for the bag-of-words query
    ``query_terms``.  Returns (doc_id, score) — score desc, doc_id asc
    (deterministic total order after round-6)."""
    terms = sorted(set(t.lower() for t in query_terms))
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    terms_arr = F.array(*[F.lit(t) for t in terms])
    # one corpus pass: doc length + query-term hits only (filter INSIDE the
    # array, so explode never generates the non-matching tokens); lazily
    # checkpointed so the stats aggregate and the scoring job share it
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: F.array_contains(terms_arr, t)).alias("hits"),
    ).localCheckpoint(eager=False)

    # corpus scalars: a 1-row aggregate — collect once, fold in as literals
    n_docs, avgdl = per_doc.agg(F.count("*"), F.avg("dl")).first()
    nd, av = F.lit(n_docs), F.lit(float(avgdl))

    # postings: per-(doc, term) tf over the pre-filtered hits
    tf = (
        per_doc.where(F.size("hits") > 0)
        .select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )

    # document frequency → Robertson-Spärck-Jones IDF (the +1 variant,
    # always positive): ln((N - df + 0.5) / (df + 0.5) + 1)
    idf = tf.groupBy("term").agg(F.count("*").alias("df")).select(
        "term",
        F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias("idf"),
    )

    scored = (
        tf.join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / av))
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
