"""Benchmark decontamination — a first-class training-data pipeline op.

Before training on a crawled corpus, documents that overlap the evaluation
benchmarks must be removed or the eval is contaminated (Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better"; the GPT-3
paper's appendix C n-gram decontamination).  The standard recipe: a
document is contaminated iff it shares at least one word n-gram with any
benchmark document.

Scale shape: the BENCHMARK side is small by definition (eval sets are
thousands of documents, the corpus is billions), so its distinct n-gram
set broadcasts and the corpus side never shuffles — the whole check is a
map-side broadcast join over the corpus scan, followed by one partial-agg
groupBy on the contaminated minority.  Shingling reuses the exact
tokenizer/shingle expressions of the dedup family (operators/dedup.py),
which are also what the DuckDB oracle mirrors byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, shingles_col


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, grams_hit): corpus documents sharing ≥1 word n-gram with
    the benchmark, with the count of distinct shared grams."""
    b_sh = (
        benchmark.select(F.explode(shingles_col(F.col(text_col), n)).alias("sh"))
        .distinct()
    )
    d_sh = _spread(
        docs.select(F.col(id_col).alias(id_col), F.col(text_col).alias("txt")),
        id_col,
    ).select(id_col, F.explode(shingles_col(F.col("txt"), n)).alias("sh"))
    return (
        d_sh.join(F.broadcast(b_sh), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("grams_hit"))  # shingles_col is distinct
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus contaminated documents (broadcast anti-join on the
    contaminated id set — itself bounded by the benchmark's reach)."""
    bad = contamination(docs, benchmark, n, id_col, text_col).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")
