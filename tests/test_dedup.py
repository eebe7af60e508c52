"""Known-answer tests for the dedup suite (exact, n-gram Jaccard + max_df
guard, MinHash-LSH, SimHash, embedding-cosine incl. hyperplane-LSH blocking).

Oracles here are independent pure-Python brute-force reimplementations of
the published algorithm definitions — not the Spark code paths — so a
regression in operators/dedup.py fails loudly without the round driver.
"""

import hashlib
import itertools
import math

import pytest
from pyspark.sql import functions as F

from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import (
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (4, "completely different text about spark engines here"),
    (5, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
    (6, "unrelated sentence mentioning nothing in common at all"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


# ---------------------------------------------------------------------------
# pure-Python oracles (independent of operators/dedup.py)
# ---------------------------------------------------------------------------

def py_shingles(text, n=3):
    toks = text.strip().lower().split()
    if len(toks) <= n:
        return {" ".join(toks[0:n])}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def py_jaccard_pairs(docs, n=3, threshold=0.0, drop=frozenset()):
    sh = {i: py_shingles(t, n) - drop for i, t in docs}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= threshold:
            out[(a, b)] = j
    return out


def py_simhash(text, bits=60):
    """Packed-long fingerprint mirroring simhash_fingerprint: per distinct
    token, first bits/4 md5 hex chars; per-bit sign-sum; bit set iff > 0."""
    toks = []
    seen = set()
    for t in text.strip().lower().split():
        if t not in seen:
            seen.add(t)
            toks.append(t)
    sv = 0
    for b in range(bits):
        s = 0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[: bits // 4], 16)
            s += 1 if (h >> b) & 1 else -1
        if s > 0:
            sv |= 1 << b
    return sv


def py_cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def test_dedup_exact_known_answer(spark):
    rows = {r.keep_id: r.dup_count for r in dedup_exact(docs_df(spark)).collect()}
    # doc 2 is byte-identical to doc 1 → one group of 2 keeping min id 1
    assert rows == {1: 2, 3: 1, 4: 1, 5: 1, 6: 1}


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def test_ngram_jaccard_matches_bruteforce(spark):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_ngram_jaccard(docs_df(spark), threshold=0.1).collect()
    }
    want = py_jaccard_pairs(DOCS, threshold=0.1)
    assert got == pytest.approx(want)
    assert (1, 2) in got and got[(1, 2)] == 1.0  # exact dups score 1
    assert (1, 3) in got  # one-word edit is a near-dup


def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    # plant a shingle shared by every doc: without the guard it creates
    # pairs between ALL docs; with max_df < n_docs those pairs vanish
    hot = [(i, f"{t} zzz hot shingle" ) for i, t in DOCS]
    df = spark.createDataFrame(hot, "doc_id long, text string")
    unguarded = {
        (r.id_a, r.id_b)
        for r in dedup_ngram_jaccard(df, threshold=0.01).collect()
    }
    # the planted trigram "zzz hot shingle" links every doc pair
    assert len(unguarded) == len(DOCS) * (len(DOCS) - 1) // 2
    guarded = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_ngram_jaccard(df, threshold=0.01, max_df=5).collect()
    }
    # guard semantics: jaccard recomputed over df-capped shingle sets
    hot_shingles = set.intersection(*[py_shingles(t) for _, t in hot])
    want = py_jaccard_pairs(hot, threshold=0.01, drop=frozenset(hot_shingles))
    assert guarded == pytest.approx(want)
    assert len(guarded) < len(unguarded)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def test_minhash_lsh_candidates_verified_exact(spark):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup_minhash_lsh(docs_df(spark), threshold=0.5).collect()
    }
    exact = py_jaccard_pairs(DOCS, threshold=0.5)
    # LSH output is a subset of the exact pair set (verification step is
    # exact), and every reported jaccard equals the true jaccard
    assert set(got) <= set(exact)
    for pair, j in got.items():
        assert j == pytest.approx(exact[pair])
    # identical docs always collide in every band → never missed
    assert (1, 2) in got and got[(1, 2)] == 1.0


def test_minhash_lsh_recall_on_near_identical_corpus(spark):
    # 10 docs in 5 near-identical pairs (one-word tail edits); groups use
    # disjoint vocabularies so only the within-group pairs (jaccard 0.9)
    # qualify — at 4 bands x 4 hashes their banded-MinHash miss prob is
    # (1 - 0.9^4)^4 ~ 1.4%
    rows = []
    for g in range(5):
        base = " ".join(f"w{g}x{i}" for i in range(10))
        rows.append((2 * g, base))
        rows.append((2 * g + 1, f"{base} extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in dedup_minhash_lsh(df, threshold=0.5).collect()}
    exact = set(py_jaccard_pairs(rows, threshold=0.5))
    assert exact  # the fixture really has qualifying pairs
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def test_simhash_equals_bruteforce_pigeonhole(spark):
    # with 4 bands over 60 bits, any pair within hamming<=3 shares at least
    # one exact 15-bit band (pigeonhole) → banding has FULL recall; the
    # operator's output must therefore equal the brute-force pair set exactly
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup_simhash(docs_df(spark), max_hamming=3).collect()
    }
    sv = {i: py_simhash(t) for i, t in DOCS}
    want = {}
    for a, b in itertools.combinations(sorted(sv), 2):
        h = bin(sv[a] ^ sv[b]).count("1")
        if h <= 3:
            want[(a, b)] = h
    assert got == want
    assert got[(1, 2)] == 0  # identical docs → identical signature


# ---------------------------------------------------------------------------
# embedding cosine (exact + hyperplane-LSH blocking)
# ---------------------------------------------------------------------------

def _planted_vectors(dim=16, groups=8, seed=7):
    """groups base vectors, each with a high-cosine twin (tiny deterministic
    perturbation) → `groups` planted near-dup pairs."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for g in range(groups):
        v = rng.randn(dim)
        v /= np.linalg.norm(v)
        w = v + 0.05 * rng.randn(dim)
        w /= np.linalg.norm(w)
        rows.append((2 * g, [float(x) for x in v]))
        rows.append((2 * g + 1, [float(x) for x in w]))
    return rows


def test_embedding_cosine_exact_matches_numpy(spark):
    rows = _planted_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in dedup_embedding_cosine(df, threshold=0.9).collect()
    }
    want = {}
    for (a, va), (b, vb) in itertools.combinations(rows, 2):
        c = py_cosine(va, vb)
        if c >= 0.9:
            want[(a, b)] = c
    assert set(got) == set(want)
    for pair in got:
        assert got[pair] == pytest.approx(want[pair], abs=1e-6)


def test_embedding_lsh_blocking_subset_and_recall(spark):
    rows = _planted_vectors(groups=12)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup_embedding_cosine(df, threshold=0.95).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup_embedding_cosine(
            df, threshold=0.95, lsh_bands=8, lsh_bits=4
        ).collect()
    }
    assert exact  # planted twins really clear the threshold
    # verification is exact → no false positives
    assert lsh <= exact
    # at cosine>=0.95 the per-bit collision prob is ~0.9; missing all 8
    # bands is ~1e-4 per pair → demand >=90% pair recall
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9


# ---------------------------------------------------------------------------
# line dedup (C4-style cross-corpus boilerplate removal)
# ---------------------------------------------------------------------------

def test_line_dedup_known_answer(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import line_dedup

    boiler = "please accept our cookie banner before reading"
    unique_a = "alpha content line with at least five words"
    unique_b = "beta content line with at least five words"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nshort line\n{unique_a}", "en"),
            (2, f"{boiler}\n{unique_b}", "en"),
            (3, boiler, "en"),  # nothing but the duplicate -> vanishes
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    # doc 1 holds the first occurrence: keeps everything
    assert out[1].text_dedup == f"{boiler}\nshort line\n{unique_a}"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 0)
    # doc 2 loses the boilerplate line but keeps its unique line
    assert out[2].text_dedup == unique_b
    assert (out[2].n_kept, out[2].n_dropped) == (1, 1)
    # doc 3 was only boilerplate -> no surviving row
    assert 3 not in out


def test_line_dedup_short_lines_always_kept(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "hi\nok", "en"), (2, "hi\nok", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    # every line is under the word threshold: both docs intact
    assert out[1].text_dedup == "hi\nok" and out[2].text_dedup == "hi\nok"
    assert out[1].n_dropped == 0 and out[2].n_dropped == 0


def test_dedup_normalized_catches_trivial_edits(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import (
        dedup_normalized,
    )

    docs = spark.createDataFrame(
        [
            (10, "Hello, World!  This is FINE."),
            (11, "hello world this is fine"),          # same after normalize
            (12, "HELLO   world -- this is \t fine?"),  # same after normalize
            (13, "a genuinely different document"),
        ],
        "doc_id long, text string",
    )
    out = dedup_normalized(docs).collect()
    by_keep = {r.keep_id: r.n_copies for r in out}
    assert by_keep[10] == 3  # the three trivially-edited copies collapse
    assert by_keep[13] == 1


# ---------------------------------------------------------------------------
# duplicated-substring detection (ExactSubstr family)
# ---------------------------------------------------------------------------

def test_substring_dedup_known_answer(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import (
        substring_dedup,
    )

    shared = " ".join(f"w{i}" for i in range(14))   # a 14-token run
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),            # first occurrence: clean
            (2, "head1 head2 " + shared),            # repeats the run
            (3, "totally unique words " + " ".join(f"u{i}" for i in range(12))),
            (4, "too short"),                         # under the window
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup(docs, window=12).collect()}
    # doc 1 holds every first occurrence -> zero duplicated mass
    assert out[1].n_dup_windows == 0 and out[1].dup_tokens == 0
    # doc 2: the 14 shared tokens give 3 duplicated windows at positions
    # 2,3,4 whose interval union is 12 + 1 + 1 = 14 tokens
    assert out[2].n_dup_windows == 3
    assert out[2].dup_tokens == 14
    assert out[2].dup_frac == pytest.approx(14 / 16)
    assert out[3].dup_tokens == 0
    assert (out[4].n_windows, out[4].dup_tokens) == (0, 0)


def test_substring_dedup_disjoint_spans_sum(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import (
        substring_dedup,
    )

    a = " ".join(f"a{i}" for i in range(12))
    b = " ".join(f"b{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, a), (2, b),
            (3, a + " gap1 gap2 gap3 " + b),  # two disjoint duplicated spans
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup(docs, window=12).collect()}
    # both 12-token spans duplicated, separated by >window gap -> 24 tokens
    assert out[3].n_dup_windows == 2 and out[3].dup_tokens == 24


# ---------------------------------------------------------------------------
# SemDeDup (k-means-blocked semantic dedup, Abbas et al. 2023)
# ---------------------------------------------------------------------------

def _py_semdedup(rows, threshold, k):
    """Plain-python mirror of operators/dedup.py:semdedup — deterministic
    seed centroids, one Lloyd step, 6dp rounding before every compare."""
    import numpy as np

    ids = sorted(i for i, _ in rows)
    V = {i: np.asarray(v, dtype=float) for i, v in rows}

    def assign(cents):
        return {
            i: min(
                (round(float(np.sum((V[i] - cv) ** 2)), 6), cid)
                for cid, cv in cents.items()
            )[1]
            for i in ids
        }

    a0 = assign({i: V[i] for i in ids[:k]})
    c1 = {
        cid: np.mean([V[i] for i in ids if a0[i] == cid], axis=0)
        for cid in set(a0.values())
    }
    a1 = assign(c1)
    drops = {}
    for a, b in itertools.combinations(ids, 2):
        if a1[a] != a1[b] or b in drops:
            continue
        c = round(
            float(
                np.dot(V[a], V[b])
                / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
            ),
            6,
        )
        if c >= threshold:
            drops[b] = (a1[b], a, c)  # first hit = min id_a (ids ascending)
    return a1, drops


def test_semdedup_matches_python_reference(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import semdedup

    rows = _planted_vectors(groups=12)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cid, r.dup_of, r.cosine)
        for r in semdedup(df, threshold=0.9, ncentroids=4).collect()
    }
    _, want = _py_semdedup(rows, 0.9, 4)
    assert set(got) == set(want)
    for vid, (cid, dup_of, cos) in got.items():
        wc, wd, wcos = want[vid]
        assert (cid, dup_of) == (wc, wd), (vid, got[vid], want[vid])
        assert cos == pytest.approx(wcos, abs=1e-6)
    assert want  # the planted twins really produce drops


def test_semdedup_keepers_are_pairwise_distant(spark):
    """The keeper set is exactly the rows with no lower-id near neighbor
    in their cluster — so no two SURVIVORS of the same cluster may sit
    within the threshold of each other (the SemDeDup guarantee)."""
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import semdedup

    rows = _planted_vectors(groups=12)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dropped = {r.vec_id for r in semdedup(df, threshold=0.9, ncentroids=4).collect()}
    a1, _ = _py_semdedup(rows, 0.9, 4)
    keepers = [i for i, _ in rows if i not in dropped]
    for a, b in itertools.combinations(sorted(keepers), 2):
        if a1[a] != a1[b]:
            continue
        va = dict(rows)[a]
        vb = dict(rows)[b]
        assert py_cosine(va, vb) < 0.9 + 1e-9, (a, b)


def test_semdedup_partition_invariant(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.dedup import semdedup

    rows = _planted_vectors(groups=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {(r.vec_id, r.cid, r.dup_of) for r in semdedup(df, 0.9, 4).collect()}
    b = {
        (r.vec_id, r.cid, r.dup_of)
        for r in semdedup(df.repartition(7, "vec_id"), 0.9, 4).collect()
    }
    assert a == b
