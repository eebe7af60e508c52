"""Approximate-nearest-neighbor search over embedding columns (task brief).

* ``cosine_topk`` — brute-force exact top-k per query (the baseline): a
  blocked cross join + window rank, all native higher-order array exprs.
* ``ivf_topk`` — the scale path: a one-pass IVF-style index (hash-seeded
  deterministic centroids + one Lloyd refinement), queries probe the
  ``nprobe`` nearest centroids only, so the join fans out to
  ``nprobe/ncentroids`` of the corpus instead of all of it.

Dot products via ``zip_with``/``aggregate`` (JVM codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k=5,
    id_col="vec_id", vec_col="embedding", q_id_col="q_id", q_vec_col="q_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Excludes self-matches
    (same id).  Returns (q_id, vec_id, rank, cosine)."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    # spread the corpus before the O(rows x queries x dim) scoring: the
    # broadcast cross join inherits the scan's partitioning, and a
    # few-split scan (single-row-group parquet here; few/giant files at
    # scale) would serialize the whole dot-product sweep on one core.
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).repartition(par, "vec_id").withColumn("nrm", _norm(F.col("v")))
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qnrm", _norm(F.col("qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 6),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )


def assign_centroids(emb: DataFrame, ncentroids=16, id_col="vec_id",
                     vec_col="embedding", refine=1):
    """Deterministic IVF coarse quantizer: centroids seeded from the
    ``ncentroids`` lowest-id vectors, refined by ``refine`` Lloyd steps
    (mean of assigned vectors).  Returns (assignments_df, centroids_df)."""
    par = emb.sparkSession.sparkContext.defaultParallelism
    # spread before the per-row distance sweeps (see cosine_topk)
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).repartition(par, "vec_id")
    cents = (
        v.orderBy("vec_id").limit(ncentroids)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    for _ in range(refine):
        assigned = _nearest(v, cents)
        # Lloyd update: element-wise mean via posexplode + re-assembly.
        # Each refinement step is pinned with an eager localCheckpoint:
        # Lloyd is iterative, and without the pin every downstream consumer
        # of the centroids (query-probe ranking AND the final assignment)
        # re-executes the whole refinement lineage — k rows of state buys
        # one full corpus pass per step instead of one per consumer per
        # step.  This is the standard iterative-algorithm pattern (same as
        # MLlib's KMeans materializing centers per iteration).
        cents = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("cv"))
            .localCheckpoint(eager=True)
        )
    return _nearest(v, cents), cents


def _nearest(v: DataFrame, cents: DataFrame) -> DataFrame:
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "d2",
        F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # d2 rounded before ranking: sub-1e-6 distance gaps are float noise
    # (summation-order dependent), so treat them as ties and break by cid —
    # makes the assignment reproducible across engines (DuckDB oracle).
    w = Window.partitionBy("vec_id").orderBy(F.asc(F.round("d2", 6)), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k=5, ncentroids=16, nprobe=4,
    id_col="vec_id", vec_col="embedding", q_id_col="q_id", q_vec_col="q_vec",
) -> DataFrame:
    """IVF-bucketed ANN: corpus sharded by nearest centroid; each query
    scans only its ``nprobe`` nearest shards.  Same output shape as
    cosine_topk (approximate)."""
    assigned, cents = assign_centroids(corpus, ncentroids, id_col, vec_col)
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("qv"),
    )
    qs = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # same 6dp tie-rounding as _nearest (cross-engine determinism)
    w = Window.partitionBy("q_id").orderBy(F.asc(F.round("d2", 6)), F.asc("cid"))
    probes = (
        qs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "qv", "cid")
    )
    cand = probes.join(assigned, "cid").where(F.col("vec_id") != F.col("q_id"))
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))),
            6,
        ),
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )
