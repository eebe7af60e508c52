"""Exact distributed quantiles, sort-based (no per-group buffering).

Why not the built-ins: Spark's exact ``percentile`` aggregate buffers
every value of a group in executor memory (ObjectHashAggregate), so a
single hot group at 100 TB — e.g. ``event_type='view'`` with 10^10 rows —
OOMs the executor; ``approx_percentile`` stays bounded but is not exact,
so it can't be oracle-checked and silently drifts at the tail (p99 over
a skewed distribution).  The reference's analytics layer computes its
rent-index medians exactly (per-city aggregation in
``/root/reference/database.py``'s stats path), so exactness is part of
the contract.

This operator computes exact interpolated quantiles with the classic
rank arithmetic instead:

1. one hash-partition + sort per group key (``row_number`` over
   ``(keys, value)``) and an unbounded ``count`` over the same
   partitioning — Catalyst plans BOTH window functions in one Window
   operator over one exchange, and the sort is external/spillable, so
   no group ever has to fit in memory;
2. each quantile ``q`` needs only the values at ranks
   ``floor((n-1)q)`` and ``ceil((n-1)q)`` — every other row contributes
   NULL — so the follow-up ``groupBy(keys)`` sums at most two non-null
   terms per group (IEEE addition of two terms is commutative-exact,
   which is what makes the DuckDB oracle reproduce values bit-for-bit
   before the final 6dp round);
3. the ``groupBy(keys)`` is satisfied by the window's own
   HashPartitioning(keys), so Catalyst inserts NO second exchange
   (same shape as ``temporal.sessionize``).

Linear interpolation matches NumPy's default / SQL ``percentile_cont``:
``pos = (n-1)*q``; ``v = v_lo*(1-frac) + v_hi*frac``.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import DataFrame, Window, functions as F


def group_quantiles(
    df: DataFrame,
    keys: Iterable[str],
    value_col: str,
    qs: Mapping[str, float],
    n_col: str = "n",
) -> DataFrame:
    """Per-``keys`` exact interpolated quantiles of ``value_col``.

    ``qs`` maps output column name -> quantile fraction in [0, 1].
    Returns one row per key group: ``keys + [n_col] + list(qs)``.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys)
    v = F.col(value_col).cast("double")
    ranked = df.select(
        *keys,
        v.alias("_v"),
        (F.row_number().over(w.orderBy(F.asc(value_col))) - F.lit(1)).alias("_rk"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )
    aggs = [F.max("_n").alias(n_col)]
    for name, q in qs.items():
        pos = (F.col("_n") - F.lit(1)) * F.lit(float(q))
        lo = F.floor(pos)
        hi = F.ceil(pos)
        frac = pos - lo.cast("double")
        contrib = (
            F.when((F.col("_rk") == lo) & (lo == hi), F.col("_v"))
            .when(F.col("_rk") == lo, F.col("_v") * (F.lit(1.0) - frac))
            .when(F.col("_rk") == hi, F.col("_v") * frac)
        )
        aggs.append(F.round(F.sum(contrib), 6).alias(name))
    return ranked.groupBy(*keys).agg(*aggs)
