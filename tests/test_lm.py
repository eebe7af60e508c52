"""unigram_nll: python reference parity (incl. OOV via vocab cap),
separate-corpus scoring, and plan hygiene (TakeOrderedAndProject for the
vocab cap, broadcast LM join, no python-eval nodes)."""

import math
import re
from collections import Counter

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.lm import (
    unigram_nll,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log near the cat"),
    (2, "a rare pangolin wandered past the mat"),  # OOV mass under a cap
    (3, "the the the cat cat mat"),
]


def _py_reference(docs, vocab_cap):
    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in docs}
    counts = Counter(w for ws in toks.values() for w in ws)
    n_total = sum(counts.values())
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
    v = len(vocab)
    denom = float(n_total + v + 1)
    lp = {w: math.log((c + 1.0) / denom) for w, c in vocab}
    oov = math.log(1.0 / denom)
    out = {}
    for d, ws in toks.items():
        nll = sum(-lp.get(w, oov) for w in ws) / len(ws)
        out[d] = (len(ws), round(nll, 6), round(math.exp(nll), 4))
    return out


@pytest.mark.parametrize("cap", [100, 5])
def test_matches_python_reference(spark, cap):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"], r["ppl"])
        for r in unigram_nll(docs, vocab_cap=cap).collect()
    }
    want = _py_reference(DOCS, cap)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6), d
        assert got[d][2] == pytest.approx(want[d][2], abs=2e-4), d


def test_oov_scores_below_any_in_vocab_token(spark):
    # with cap=5 the rare words are OOV and must score the smoothed floor:
    # strictly higher nll than a doc made of head tokens only
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r["nll"] for r in unigram_nll(docs, vocab_cap=5).collect()}
    assert rows[2] > rows[3]  # pangolin doc beats the all-head-tokens doc


def test_separate_trusted_corpus(spark):
    # CCNet's actual shape: LM trained on a trusted corpus, scoring a
    # different table. A doc matching the trusted distribution scores
    # lower nll than one that is all-OOV.
    trusted = spark.createDataFrame(DOCS, ["doc_id", "text"])
    eval_docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq vv ww")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r["nll"]
        for r in unigram_nll(eval_docs, corpus=trusted, vocab_cap=100).collect()
    }
    assert rows[10] < rows[11]


def test_plan_shape(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        unigram_nll(docs, vocab_cap=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # vocab cap, not a global window
    assert "BroadcastHashJoin" in plan  # LM broadcasts to the token side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
