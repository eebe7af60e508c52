"""Keyword relevance search over the document corpus: BM25 top-k.

Training-data pipelines use lexical scoring both for targeted corpus
queries ("find the docs about X") and as a quality/topicality signal when
assembling domain mixes.  BM25 (Robertson/Spärck Jones probabilistic
relevance framework — the Okapi formulation) is the standard.

Shape at scale (the inverted-index dataflow, expressed relationally):

* tokenize → explode is filtered to the query terms BEFORE any shuffle —
  the per-(doc, term) aggregation only ever shuffles rows matching the
  handful of query terms, i.e. the postings lists, not the corpus;
* term statistics (document frequency → IDF) are a |Q|-row relation,
  broadcast to the scoring join;
* corpus scalars (N, avgdl) ride the same broadcast (cross join of a
  1-row aggregate) — no driver round-trip;
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
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("txt"))
    toks = F.split(F.trim(F.lower(F.col("txt"))), r"\s+")
    base = d.select("doc_id", toks.alias("toks"))

    # corpus scalars: one row, broadcast into every consumer
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )

    # postings: explode, filter to query terms pre-shuffle, per-(doc,term) tf
    tf = (
        base.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )

    # document frequency → Robertson-Spärck-Jones IDF (the +1 variant,
    # always positive): ln((N - df + 0.5) / (df + 0.5) + 1)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (
        df_.crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )

    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
