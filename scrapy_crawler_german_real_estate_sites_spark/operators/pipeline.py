"""End-to-end corpus-cleaning pipeline: the hygiene operators composed in
the order a production training-data run applies them.

Each stage exists (and is oracle-verified) on its own; this module pins
how they COMPOSE — the part that breaks silently when a refactor changes
a column name or a stage starts consuming the wrong intermediate — and
gives `jobs/corpus_job.py` one callable to ship via spark-submit.

Stage order follows the C4 / Gopher / RefinedWeb consensus:

1. quality gate   (row-local + per-doc grams; cuts the junk before any
                   corpus-wide work touches it)
2. exact dedup    (md5 groupBy keepers — cheapest corpus-wide op first)
3. near dedup     (normalized-text md5: case/punct/reflow copies)
4. line dedup     (cross-corpus boilerplate removal, rewrites text)
5. PII redaction  (row-local regexp chain over the surviving text)
6. splits         (deterministic salted-hash train/valid assignment)

Scale notes: stages 1–3 only ever SHRINK the corpus, so the expensive
text-rewriting stages (4–5) run on the smallest possible input; every
inter-stage handoff is a semi-join on the id column (map-side combinable
keeper sets, AQE-skew-safe), never a wide row carried through a shuffle
it doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import pii_counts, redact_pii
from ..operators.dedup import dedup_exact, dedup_normalized, line_dedup
from ..operators.quality import quality_filter
from ..operators.sampling import split_col


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    valid_frac: float = 0.05,
    min_line_words: int = 5,
    **quality_overrides,
) -> DataFrame:
    """Run the full hygiene chain; returns one row per SURVIVING document:
    (doc_id, <original non-text cols>, text, n_emails, n_ips, n_phones,
    split).  The text column holds the line-deduped, PII-redacted form.
    """
    carry = [c for c in docs.columns if c not in (id_col, text_col)]

    # 1. quality gate — keep decision only; semi-join back by id
    q = quality_filter(docs, id_col=id_col, text_col=text_col,
                       **quality_overrides)
    kept = docs.join(
        q.where("keep").select(id_col), id_col, "left_semi"
    )

    # 2. exact dedup — canonical keeper per byte-identical text
    ex = dedup_exact(kept, id_col=id_col, text_col=text_col)
    kept = kept.join(
        ex.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )

    # 3. normalized dedup — canonical keeper per case/punct/reflow class
    nm = dedup_normalized(kept, id_col=id_col, text_col=text_col)
    kept = kept.join(
        nm.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )

    # 4. line dedup — rewrites text; docs reduced to nothing disappear
    ld = line_dedup(
        kept, id_col=id_col, text_col=text_col,
        min_words=min_line_words, carry_cols=(),
    ).select(id_col, F.col("text_dedup").alias(text_col))
    kept = kept.drop(text_col).join(ld, id_col)

    # 5. PII redaction + counts — row-local
    # 6. deterministic split — row-local
    return kept.select(
        id_col,
        *carry,
        redact_pii(F.col(text_col)).alias(text_col),
        *pii_counts(F.col(text_col)),
        split_col(id_col, valid_frac).alias("split"),
    )
