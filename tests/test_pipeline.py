"""Corpus-hygiene pipeline composition: the stages must interoperate —
quality gate cuts junk first, dedups keep canonical ids, line dedup
rewrites text, PII scrub and split assignment land on the survivors."""

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.pipeline import (
    clean_corpus,
)


@pytest.fixture()
def corpus(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then "
        "walks slowly home through the quiet evening streets tonight"
    )
    boiler = "please accept all cookies before you continue reading here"
    rows = [
        # 1: clean doc, first occurrence of the boilerplate line
        (1, good + "\n" + boiler, "en"),
        # 2: unique body but repeats the boilerplate line -> line-deduped
        (2, ("many other perfectly normal words fill this document body "
             "with enough variety to pass every quality gate easily")
            + "\n" + boiler, "en"),
        # 3: byte-identical copy of 1 -> exact dedup drops it
        (3, good + "\n" + boiler, "en"),
        # 4: junk (one word repeated) -> quality gate drops it
        (4, "spam " * 60, "en"),
        # 5: clean doc with an email -> redacted
        (5, ("reach our entire friendly support team any weekday morning "
             "by writing to help.desk@example.org with your request and "
             "someone will answer before the next business day closes"), "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_clean_corpus_end_to_end(corpus):
    out = {r.doc_id: r for r in clean_corpus(corpus, valid_frac=0.05).collect()}
    # survivors: 1 (canonical), 2 (line-deduped), 5 (redacted)
    assert set(out) == {1, 2, 5}
    # doc 2 lost the boilerplate line but kept its body
    assert "cookies" not in out[2].text
    assert "variety" in out[2].text
    # doc 1 (first occurrence) keeps both lines
    assert "cookies" in out[1].text
    # doc 5's email is scrubbed and counted
    assert "<EMAIL>" in out[5].text and out[5].n_emails == 1
    # carry columns and split survive
    assert all(r.lang == "en" for r in out.values())
    assert all(r.split in ("train", "valid") for r in out.values())


def test_clean_corpus_is_deterministic(corpus):
    a = sorted(map(tuple, clean_corpus(corpus).collect()))
    b = sorted(map(tuple, clean_corpus(corpus).collect()))
    assert a == b
