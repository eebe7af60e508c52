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
