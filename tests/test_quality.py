"""quality_filter: planted violators of every rule, python reference
parity, and plan hygiene (no python-eval nodes)."""

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.quality import (
    DEFAULTS,
    quality_filter,
)

# one doc per rule, plus two clean docs. 'the' supplies stopword hits;
# vocab is varied enough to stay under the dup/bigram thresholds.
CLEAN = (
    "the quick brown fox jumps over one lazy dog while the tall ship "
    "sails past nine green hills under a pale winter moon tonight "
    "carrying spice wine and copper coins from distant ports"
)
DOCS = [
    (0, CLEAN),
    (1, CLEAN + " extra words here keep this document clearly unique today"),
    # too_short: < 20 words
    (2, "the tiny doc has very few words inside it"),
    # word_len: mean word length > 10
    (3, " ".join(["the"] + ["extraordinarily"] * 30 + ["incomprehensibilities"] * 10)),
    # no_stopwords: zero hits across every language list
    (4, " ".join(f"tok{i} blob{i % 7} xyz{i % 5}" for i in range(12))),
    # dup_words: tiny vocabulary, high 1 - distinct/total
    (5, " ".join(["the", "cat", "sat"] * 15)),
    # top_bigram: one bigram at >12.5% of word mass, but vocabulary varied
    # enough (dup_word_frac ~0.18) that dup_words does NOT fire first
    (6, "the win now "
        + " ".join(f"foxes{i} gates{i} win now" for i in range(3))
        + " " + " ".join(f"hills{i}" for i in range(19))),
    # dup_5gram: a 5-word block repeated once, diluted so neither
    # dup_words (~0.125) nor top_bigram (4/40 = 0.1) fires first
    (7, "the alpha beta gamma delta epsilon "
        + " ".join(f"w{i}" for i in range(24))
        + " alpha beta gamma delta epsilon q1 q2 q3 q4 q5"),
]


def _py_reference(text):
    import re

    toks = re.split(r"\s+", text.strip().lower())
    n = len(toks)
    if n < DEFAULTS["min_words"]:
        return "too_short"
    mwl = round(sum(len(t) for t in re.split(r"\s+", text.strip())) / max(n, 1), 6)
    if mwl < DEFAULTS["min_mwl"] or mwl > DEFAULTS["max_mwl"]:
        return "word_len"
    from scrapy_crawler_german_real_estate_sites_spark.functions.textops import (
        LANG_STOPWORDS,
    )

    hits = sum(
        len(re.findall(rf"\b{w}\b", text.lower()))
        for ws in LANG_STOPWORDS.values()
        for w in ws
    )
    if round(hits / max(n, 1), 6) <= 0:
        return "no_stopwords"
    if round(1.0 - len(set(toks)) / n, 6) > DEFAULTS["max_dup_word"]:
        return "dup_words"
    from collections import Counter

    bi = Counter(" ".join(toks[i : i + 2]) for i in range(max(n - 1, 1)))
    # deterministic tie-break: max count, then lexicographic gram
    top_cnt = max(bi.values())
    if round(top_cnt * 2.0 / n, 6) > DEFAULTS["max_top_bigram"]:
        return "top_bigram"
    g5 = Counter(" ".join(toks[i : i + 5]) for i in range(max(n - 4, 1)))
    dup5 = sum(c * 5 for c in g5.values() if c > 1)
    if round(dup5 / n, 6) > DEFAULTS["max_dup_5gram"]:
        return "dup_5gram"
    return "ok"


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["reason"], r["keep"])
        for r in quality_filter(docs).collect()
    }


def test_each_rule_fires_on_its_planted_doc(result):
    expected = {
        0: "ok",
        1: "ok",
        2: "too_short",
        3: "word_len",
        4: "no_stopwords",
        5: "dup_words",
        6: "top_bigram",
        7: "dup_5gram",
    }
    assert {k: v[0] for k, v in result.items()} == expected
    assert all(v[1] == (v[0] == "ok") for v in result.values())


def test_matches_python_reference(result):
    for doc_id, text in DOCS:
        assert result[doc_id][0] == _py_reference(text), doc_id


def test_plan_has_no_python_eval(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# compression-ratio signal (round 4)
# ---------------------------------------------------------------------------


def test_compression_ratio_python_mirror(spark):
    import zlib

    from scrapy_crawler_german_real_estate_sites_spark.operators.quality import (
        compression_ratio,
    )

    import random as _rnd
    import string as _str

    rng = _rnd.Random(13)
    noise = "".join(rng.choice(_str.ascii_letters + _str.digits)
                    for _ in range(800))
    docs = [
        ("prose",
         "Die Wohnung liegt zentral und hat drei helle Zimmer. "
         "Vom Südbalkon blickt man über den alten Stadtpark. "
         "Eine Einbauküche wurde im letzten Frühjahr montiert. "
         "Der Vermieter wohnt selbst im Erdgeschoss des Hauses. "
         "Schulen, Ärzte und zwei Supermärkte sind fußläufig. "
         "Das Bad verfügt über Wanne, Dusche und ein Fenster. "
         "Parkett aus Eiche durchzieht sämtliche Wohnräume. "
         "Die Nebenkosten enthalten Heizung sowie Warmwasser. "
         "Ein Kellerabteil und ein Fahrradraum gehören dazu. "
         "Besichtigungen sind ab kommender Woche möglich."),
        ("template", "wohnung kaufen " * 200),
        ("noise", noise),
        ("empty", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    for did, text in docs:
        raw = text.encode("utf-8")
        comp = zlib.compress(raw, 6)
        r = got[did]
        assert r.n_bytes == len(raw)
        assert r.n_compressed == len(comp)
        want = round(len(comp) / len(raw), 6) if raw else 1.0
        assert r.ratio == want
    # the band keeps prose, drops the templated doc (hyper-compressible)
    assert got["prose"].keep is True
    assert got["template"].keep is False
    assert got["template"].ratio < 0.1
    # near-incompressible noise exceeds natural-prose ratios
    assert got["noise"].ratio > got["prose"].ratio


def test_compression_ratio_partition_invariant(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.quality import (
        compression_ratio,
    )

    rows = [(f"d{i}", f"text body {i} " * (i % 7 + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted((r.doc_id, r.ratio) for r in compression_ratio(df).collect())
    b = sorted((r.doc_id, r.ratio)
               for r in compression_ratio(df.repartition(7)).collect())
    assert a == b
