"""Deterministic dataset splitting (operators/sampling.py): the split
must be a pure function of the salted id (stable, partition-invariant),
proportions must track the requested fraction, and different salts must
draw independent assignments."""

import hashlib

import pytest
from pyspark.sql import functions as F

from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
    dataset_split,
    split_col,
    split_threshold_hex,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_assignment_matches_reference_hash(spark, docs):
    """Spark's assignment equals a plain-python md5 reimplementation —
    the engine-independence the DuckDB oracle also relies on."""
    rows = (
        docs.withColumn("split", split_col("doc_id", 0.1))
        .where(F.col("doc_id") < 500)
        .collect()
    )
    thr = split_threshold_hex(0.1)
    for r in rows:
        h = hashlib.md5(f"split-v1:{r.doc_id}".encode()).hexdigest()[:8]
        assert r.split == ("valid" if h < thr else "train"), r


def test_split_is_partition_invariant(spark, docs):
    a = docs.withColumn("s", split_col("doc_id", 0.07))
    b = docs.repartition(17, "lang").withColumn("s", split_col("doc_id", 0.07))
    assert a.join(b, "doc_id").where(a["s"] != b["s"]).count() == 0


def test_split_is_stable_under_growth(spark, docs):
    """Adding documents never moves an existing one between splits."""
    small = docs.where(F.col("doc_id") < 5000)
    before = dict(
        small.withColumn("s", split_col("doc_id", 0.05))
        .select("doc_id", "s").collect()
    )
    after = dict(
        docs.withColumn("s", split_col("doc_id", 0.05))
        .where(F.col("doc_id") < 5000)
        .select("doc_id", "s").collect()
    )
    assert before == after


def test_proportions_track_fraction_per_stratum(spark, docs):
    audit = dataset_split(docs, valid_frac=0.1, strata_col="lang").collect()
    per_lang = {}
    for r in audit:
        per_lang.setdefault(r.lang, {})[r.split] = r.docs
    assert len(per_lang) == 4
    for lang, counts in per_lang.items():
        frac = counts.get("valid", 0) / (counts.get("valid", 0) + counts["train"])
        # 5000 draws at p=0.1 — 4 sigma ≈ 0.017
        assert abs(frac - 0.1) < 0.02, (lang, frac)


def test_salts_draw_independent_splits(spark, docs):
    joint = (
        docs.select(
            "doc_id",
            (split_col("doc_id", 0.5, salt="a") == "valid").alias("va"),
            (split_col("doc_id", 0.5, salt="b") == "valid").alias("vb"),
        )
        .agg(
            F.avg(F.col("va").cast("double")).alias("pa"),
            F.avg(F.col("vb").cast("double")).alias("pb"),
            F.avg((F.col("va") & F.col("vb")).cast("double")).alias("pab"),
        )
        .collect()[0]
    )
    # independence: P(a∧b) ≈ P(a)·P(b); 20k draws → generous tolerance
    assert abs(joint.pab - joint.pa * joint.pb) < 0.02, joint


def test_bad_fraction_rejected():
    with pytest.raises(ValueError):
        split_threshold_hex(1.5)


def test_degenerate_fractions_are_exact(spark, docs):
    """valid_frac=1.0 assigns EVERY row to 'valid' (the clamped threshold
    plus the >=1.0 short-circuit — not the ~1/16 a 9-char threshold would
    give); 0.0 assigns every row to 'train'."""
    assert split_threshold_hex(1.0) == "ffffffff"
    n = docs.count()
    all_valid = docs.withColumn("s", split_col("doc_id", 1.0))
    assert all_valid.where(F.col("s") == "valid").count() == n
    all_train = docs.withColumn("s", split_col("doc_id", 0.0))
    assert all_train.where(F.col("s") == "train").count() == n


def test_domain_cap_known_answer_and_plan(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        domain_cap,
    )

    rows = [(i, "big.example", 100 - i) for i in range(10)]  # 10 docs, one domain
    rows += [(100, "small.example", 5), (101, "small.example", 5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = domain_cap(docs, k=3)
    got = sorted((r.source, r.doc_id) for r in out.collect())
    # big domain capped at its 3 longest docs; ties broken by doc_id
    assert got == [
        ("big.example", 0), ("big.example", 1), ("big.example", 2),
        ("small.example", 100), ("small.example", 101),
    ]
    # rank-filter must execute as the pre-shuffle group-limit, so the
    # exchange moves O(groups x k) rows, not the corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_temperature_mix_matches_python_reference(spark):
    import hashlib
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        temperature_mix,
    )

    sizes = {"big.example": 200, "mid.example": 40, "tiny.example": 3}
    rows = [
        (s, f"https://{s}/doc/{i}") for s, n in sizes.items() for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "source string, url string")
    alpha, budget = 0.6, 120
    out = {r.source: r for r in
           temperature_mix(docs, alpha=alpha, budget=budget).collect()}

    tp = sum(n ** alpha for n in sizes.values())
    for s, n in sizes.items():
        w = n ** alpha / tp
        frac = min(1.0, round(budget * w / n, 9))
        assert out[s].n_docs == n
        assert out[s].weight == pytest.approx(w, abs=1e-12)
        assert out[s].keep_frac == pytest.approx(frac, abs=1e-12)
        thr = format(int(frac * (1 << 32)), "08x")
        kept = sum(
            1 for i in range(n)
            if frac >= 1.0
            or hashlib.md5(f"mix-v1:https://{s}/doc/{i}".encode()).hexdigest()[:8] < thr
        )
        assert out[s].n_kept == kept
    # the tiny source is upweighted past its size -> fully kept
    assert out["tiny.example"].keep_frac == 1.0
    assert out["tiny.example"].n_kept == 3


def test_temperature_mix_budget_covers_corpus(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        temperature_mix,
    )

    docs = spark.createDataFrame(
        [("a", f"u{i}") for i in range(20)] + [("b", f"v{i}") for i in range(10)],
        "source string, url string",
    )
    out = temperature_mix(docs, alpha=1.0, budget=1000).collect()
    # alpha=1 reproduces natural proportions; a budget over the corpus
    # size keeps everything
    assert all(r.n_kept == r.n_docs and r.keep_frac == 1.0 for r in out)


def test_stratified_sample_matches_python_reference(spark, docs):
    """Exact-n sample = first n ids of each stratum ordered by the salted
    md5 — recomputed in plain python; and the plan pre-filters map-side
    (WindowGroupLimit), so the shuffle carries O(strata x n) rows."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        stratified_sample,
    )

    small = docs.where(F.col("doc_id") < 1000)
    out = stratified_sample(small, strata_col="lang", n=7)
    got = {(r["lang"], r["doc_id"], r["rk"]) for r in out.collect()}

    want = set()
    for lang in range(4):
        ids = [i for i in range(1000) if i % 4 == lang]
        key = lambda i: (hashlib.md5(f"sample-v1:{i}".encode()).hexdigest(), i)
        for rk, i in enumerate(sorted(ids, key=key)[:7], start=1):
            want.add((str(lang), i, rk))
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


# ---------------------------------------------------------------------------
# shard_pack (token-budget shard packing via two-pass prefix sum)
# ---------------------------------------------------------------------------

def _pack_docs(spark, n=3000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.col("id") % 37 + 1).cast("int"))
        ).alias("text"),
    )


def _py_shard_pack(n, budget):
    """The semantic spec: one global running sum in md5 order."""
    rows = sorted(
        (hashlib.md5(f"pack-v1:{i}".encode()).hexdigest(), i, i % 37 + 1)
        for i in range(n)
    )
    out, cum = {}, 0
    for _, i, tok in rows:
        out[i] = (tok, cum // budget)
        cum += tok
    return out


def test_shard_pack_matches_python_reference(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        shard_pack,
    )

    got = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in shard_pack(_pack_docs(spark), budget=500).collect()
    }
    want = _py_shard_pack(3000, 500)
    assert got == want
    assert len({s for _, s in want.values()}) > 5  # non-trivial packing


def test_shard_pack_partition_and_bucket_invariant(spark):
    """The two-pass prefix sum must reproduce the one-window spec no
    matter how the input is partitioned or how many prefix buckets the
    dataflow uses — bucketing is an execution detail, not a semantic."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        shard_pack,
    )

    d = _pack_docs(spark, 2000)
    a = {r.doc_id: r.shard_id for r in shard_pack(d, budget=300).collect()}
    b = {
        r.doc_id: r.shard_id
        for r in shard_pack(d.repartition(13), budget=300).collect()
    }
    c = {
        r.doc_id: r.shard_id
        for r in shard_pack(d, budget=300, bucket_hex_len=1).collect()
    }
    assert a == b == c


def test_shard_pack_shards_are_budget_sized(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.sampling import (
        shard_pack,
    )

    rows = shard_pack(_pack_docs(spark), budget=500).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, 0)
        by_shard[r.shard_id] += r.n_tokens
    last = max(by_shard)
    assert sorted(by_shard) == list(range(last + 1))  # contiguous ids
    for s, tot in by_shard.items():
        # a closed shard's total sits within one max-doc of the budget:
        # shard s spans [start_s, start_{s+1}) where each start overshoots
        # its multiple of B by at most one straddling document
        if s != last:
            assert 500 - 37 < tot < 500 + 37, (s, tot)
    assert sum(by_shard.values()) == sum(r.n_tokens for r in rows)
