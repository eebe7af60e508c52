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


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011) — the compressed path
# ---------------------------------------------------------------------------

def _subvectors(df, m, subdim, id_name, vec_name):
    """Long form: one row per (id, subspace) with the sliced subvector."""
    return df.select(
        F.col(id_name).alias("vec_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        F.col(vec_name).cast("array<double>").alias("v"),
    ).select(
        "vec_id", "s",
        F.slice("v", F.col("s") * subdim + 1, subdim).alias("sv"),
    )


def _nearest_code(sub, cents):
    """Nearest codebook entry per (vec_id, s): broadcast the O(m·ksub)
    codebook, equi-join on the subspace, 6dp tie-rounding + code
    tie-break (cross-engine determinism, same policy as _nearest)."""
    scored = sub.join(F.broadcast(cents), "s").withColumn(
        "d2",
        F.aggregate(
            F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("vec_id", "s").orderBy(
        F.asc(F.round("d2", 6)), F.asc("code")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", "sv", "code")
    )


def pq_encode(
    corpus: DataFrame, m=8, ksub=16, subdim=8,
    id_col="vec_id", vec_col="embedding", refine=1,
):
    """Train per-subspace codebooks and encode the corpus.

    Codebooks are deterministic: subspace ``s``'s initial centroids are
    the ``ksub`` lowest-id vectors' ``s``-th slices (code = seed vec_id),
    refined by ``refine`` Lloyd steps — the same seeded-Lloyd recipe as
    ``assign_centroids``, run once per subspace via a single long-form
    dataflow keyed by ``s`` (no per-subspace driver loop).  Returns
    ``(codes, codebooks)``: codes = (vec_id, s, code) — m small ints per
    vector, the 32x-compressed representation PQ exists for — and
    codebooks = (s, code, cv).

    Scale shape: codebooks are O(m·ksub) rows and broadcast everywhere;
    the corpus-side work is one explode (×m) + broadcast equi-join (×ksub
    fan-out inside the join, reduced immediately by the per-(vec_id,s)
    rank) — embarrassingly parallel, no corpus shuffle beyond the
    groupBy in each Lloyd mean (map-side combinable, keyed by
    (s, code, pos) — m·ksub·subdim cells)."""
    sub = _subvectors(corpus, m, subdim, id_col, vec_col)
    seeds = corpus.orderBy(id_col).limit(ksub).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias(vec_col)
    )
    cents = _subvectors(seeds, m, subdim, "vec_id", vec_col).select(
        "s", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    for _ in range(refine):
        assigned = _nearest_code(sub, cents)
        # per-subspace Lloyd mean; eager pin for the same reason as
        # assign_centroids (iterative lineage, multiple consumers)
        cents = (
            assigned.select("s", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("s", "code", "pos")
            .agg(F.avg("val").alias("mu"))
            .groupBy("s", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm"))
            .select("s", "code", F.transform("pm", lambda x: x["mu"]).alias("cv"))
            .localCheckpoint(eager=True)
        )
    codes = _nearest_code(sub, cents).select("vec_id", "s", "code")
    return codes, cents


def pq_topk(
    corpus: DataFrame, queries: DataFrame, k=5, m=8, ksub=16, subdim=8,
    rerank=None,
    id_col="vec_id", vec_col="embedding", q_id_col="q_id", q_vec_col="q_vec",
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): approximate squared L2 between
    a query and a coded vector = Σ_s d²(q_s, codebook[s][code_s]) — the
    query builds an O(m·ksub)-row distance table, and the corpus scan
    touches only the m-byte codes, never the vectors.  Returns
    (q_id, vec_id, rank, approx_d2), self-matches excluded.

    This is the compressed complement to ``ivf_topk``: IVF prunes WHICH
    vectors to score, PQ shrinks WHAT is read per scored vector (at 100 TB
    the codes table is ~32× smaller than the float corpus — the scan cost
    drops by that factor; faiss composes both as IVFADC).  The distance
    tables for all queries broadcast as one O(nq·m·ksub) dim; the scoring
    join is a (s, code) equi hash join followed by a map-side-combinable
    sum — zero corpus shuffle wider than the groupBy's partial
    aggregates.

    ``rerank=R`` adds the standard refinement stage (Jégou et al. §VII /
    faiss IndexRefine): the top ``R`` ADC candidates per query are
    re-scored with EXACT d² against the float vectors and the final top-k
    ranks by that — quantization error then only costs recall if a true
    neighbor falls outside the top R, not whenever codes blur the order
    inside it.  Cost shape: the candidate set (O(nq·R) ids) broadcasts
    onto the corpus — one equi hash join retrieves exactly the R vectors
    per query; output columns become (q_id, vec_id, rank, d2)."""
    codes, cents = pq_encode(corpus, m, ksub, subdim, id_col, vec_col)
    qsub = _subvectors(queries, m, subdim, q_id_col, q_vec_col).select(
        F.col("vec_id").alias("q_id"), "s", F.col("sv").alias("qsv")
    )
    dtab = qsub.join(F.broadcast(cents), "s").select(
        "q_id", "s", "code",
        F.aggregate(
            F.zip_with("qsv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("d2"),
    )
    scored = (
        codes.join(F.broadcast(dtab), ["s", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if rerank is None:
        return ranked.where(F.col("rank") <= k).select(
            "q_id", "vec_id", "rank", "approx_d2"
        )
    cand = ranked.where(F.col("rank") <= rerank).select("q_id", "vec_id")
    vv = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    qq = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("qv"),
    )
    exact = (
        vv.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qq), "q_id")
        .select(
            "q_id", "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x,
                ),
                6,
            ).alias("d2"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "d2")
    )


def ivfadc_topk(
    corpus: DataFrame, queries: DataFrame, k=5,
    ncentroids=8, nprobe=3, m=8, ksub=16, subdim=8, rerank=None,
    encode_residuals=True, pq_refine=1,
    id_col="vec_id", vec_col="embedding", q_id_col="q_id", q_vec_col="q_vec",
) -> DataFrame:
    """IVF + PQ composed — the faiss-IVFPQ dataflow: the coarse quantizer
    prunes WHICH vectors each query scores (``nprobe``/``ncentroids`` of
    the corpus), product-quantization codes shrink WHAT a scored
    candidate reads (m small ints, never the floats), and ``rerank=R``
    refines the top ADC candidates with exact d².

    ``encode_residuals=True`` (default, the faiss IVFADC proper —
    Jégou et al. 2011 §IV.A): codes quantize the COARSE RESIDUAL
    ``v − centroid(v)`` instead of the raw vector.  On clustered data
    the residuals share a common (near-zero-mean) distribution across
    cells, so the ksub codewords spend their capacity on within-cell
    structure rather than re-describing the cell offsets — the standard
    recall fix the round-4 Zipf fixture quantified (IVFADC .755 raw vs
    IVF .903).  The query side then builds one distance table PER PROBED
    CELL from the query residual ``q − centroid(cell)`` — the extra
    machinery residual encoding costs (×nprobe table rows, still an
    O(nprobe·m·ksub) broadcast).  ``False`` keeps the raw-vector
    variant for comparison.

    Scale shape = the union of its parts: centroids and codebooks are
    O(ncentroids + m·ksub) broadcasts; the corpus-side state is the codes
    table JOINED ONCE with its coarse assignment (cid, m codes per
    vector — still ~32× smaller than the float corpus); each query's
    probe set and distance table broadcast; scoring is a cid equi join
    fanning out to nprobe shards followed by a map-side-combinable sum.
    Returns (q_id, vec_id, rank, approx_d2) or (…, d2) with rerank."""
    assigned, cents = assign_centroids(
        corpus, ncentroids=ncentroids, id_col=id_col, vec_col=vec_col
    )
    vv0 = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if encode_residuals:
        resid = (
            vv0.join(assigned.select("vec_id", "cid"), "vec_id")
            .join(F.broadcast(cents), "cid")
            .select(
                "vec_id", "cid",
                F.zip_with("v", "cv", lambda a, b: a - b).alias("rv"),
            )
            .localCheckpoint(eager=False)
        )
        codes, books = pq_encode(resid, m, ksub, subdim, "vec_id", "rv",
                                 refine=pq_refine)
        coded = codes.join(resid.select("vec_id", "cid"), "vec_id")
    else:
        codes, books = pq_encode(corpus, m, ksub, subdim, id_col, vec_col,
                                 refine=pq_refine)
        # corpus index: coarse shard + PQ codes, one equi join, built once
        coded = codes.join(assigned.select("vec_id", "cid"), "vec_id")

    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("qv"),
    )
    qs = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.asc(F.round("d2", 6)), F.asc("cid"))
    probes = (
        qs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "cid")
    )
    if encode_residuals:
        # one distance table per (query, probed cell), over the QUERY
        # RESIDUAL for that cell — O(queries·nprobe·m·ksub) rows
        qr = (
            probes.join(q, "q_id")
            .join(F.broadcast(cents), "cid")
            .select(
                "q_id", "cid",
                F.zip_with("qv", "cv", lambda a, b: a - b).alias("qrv"),
            )
        )
        qsub = qr.select(
            "q_id", "cid",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            "qrv",
        ).select(
            "q_id", "cid", "s",
            F.slice("qrv", F.col("s") * subdim + 1, subdim).alias("qsv"),
        )
        dtab = qsub.join(F.broadcast(books), "s").select(
            "q_id", "cid", "s", "code",
            F.aggregate(
                F.zip_with("qsv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("d2"),
        )
        dtab_keys = ["q_id", "cid", "s", "code"]
    else:
        qsub = _subvectors(queries, m, subdim, q_id_col, q_vec_col).select(
            F.col("vec_id").alias("q_id"), "s", F.col("sv").alias("qsv")
        )
        dtab = qsub.join(F.broadcast(books), "s").select(
            "q_id", "s", "code",
            F.aggregate(
                F.zip_with("qsv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("d2"),
        )
        dtab_keys = ["q_id", "s", "code"]
    scored = (
        coded.join(F.broadcast(probes), "cid")
        .where(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(dtab), dtab_keys)
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("approx_d2"))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w2))
    if rerank is None:
        return ranked.where(F.col("rank") <= k).select(
            "q_id", "vec_id", "rank", "approx_d2"
        )
    cand = ranked.where(F.col("rank") <= rerank).select("q_id", "vec_id")
    vv = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # exact re-rank in the FAMILY metric (cosine, like cosine_topk /
    # ivf_topk — the ADC stage prunes in L2, PQ's natural space, but the
    # final ranking must match the metric the exact searchers use; an L2
    # re-rank against cosine semantics caps recall at the metric-mismatch
    # ceiling, measured 0.845 on the Zipf fixture's unnormalized vectors)
    exact = (
        vv.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id", "vec_id",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * _norm(F.col("qv"))),
                6,
            ).alias("cosine"),
        )
    )
    w3 = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w3))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )
