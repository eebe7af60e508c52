"""The storage-format switch (SURVEY.md §1.2 / north_rule: Iceberg
frontier/seen/listings snapshots).  The sandbox has no Iceberg runtime
jars, so the iceberg path is exercised only where available
(skipped-if-unavailable) — the point is that switching formats is a CONFIG
change (`SPARK_GRAFT_TABLE_FORMAT=iceberg`), not a code change: every
engine state write/read goes through write_state/read_state."""

import os

import pytest

from scrapy_crawler_german_real_estate_sites_spark.sources import tables


def test_default_format_is_parquet(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TABLE_FORMAT", raising=False)
    assert tables.table_format() == "parquet"


def test_parquet_state_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TABLE_FORMAT", raising=False)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "state" / "pending")
    tables.write_state(df, p)
    got = sorted((r.id, r.v) for r in tables.read_state(spark, p).collect())
    assert got == [(1, "a"), (2, "b")]


def test_iceberg_ident_is_deterministic_and_run_disjoint():
    a = tables._iceberg_ident("/runA/ckpt_0003/pending")
    b = tables._iceberg_ident("/runB/ckpt_0003/pending")
    assert a == tables._iceberg_ident("/runA/ckpt_0003/pending")
    assert a != b  # same ckpt name in different runs → different namespaces
    assert a.startswith("graft.ckpt_0003_") and a.endswith(".pending")


def test_parquet_delete_rows_retention(spark, tmp_path, monkeypatch):
    """D9/D10 executed sink side, parquet fallback: delete_rows removes
    exactly the liveness/retention candidate set via anti-join rewrite."""
    monkeypatch.delenv("SPARK_GRAFT_TABLE_FORMAT", raising=False)
    listings = spark.createDataFrame(
        [(f"https://x.de/{i}", i) for i in range(100)], "url string, v int"
    )
    p = str(tmp_path / "listings")
    tables.write_state(listings, p)
    # candidate set: the D9-style "gone" urls (every 7th), with dupes to
    # prove the key projection dedups
    cand = spark.createDataFrame(
        [(f"https://x.de/{i}",) for i in range(0, 100, 7)] * 2
        + [("https://x.de/not-present",)],
        "url string",
    )
    n = tables.delete_rows(spark, p, cand)
    assert n == len(range(0, 100, 7))
    left = {r.url for r in tables.read_state(spark, p).collect()}
    assert left == {f"https://x.de/{i}" for i in range(100) if i % 7 != 0}


def test_iceberg_merge_delete_retention(spark, tmp_path, monkeypatch):
    """D9/D10 executed sink side, Iceberg leg: MERGE … WHEN MATCHED THEN
    DELETE against a real Iceberg table (row-level delete, no rewrite).
    Skipped when the runtime jars are absent (this sandbox)."""
    if not tables.iceberg_ready(spark):
        pytest.skip("Iceberg Spark runtime jars not on the classpath "
                    "(sandbox has none); the switch is config-only")
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    s = tables.get_spark(app="iceberg-merge-test", cpus="2",
                         shuffle_partitions=2)
    p = str(tmp_path / "run" / "listings")
    tables.write_state(
        s.createDataFrame(
            [(f"https://x.de/{i}", i) for i in range(50)], "url string, v int"
        ),
        p,
    )
    cand = s.createDataFrame(
        [(f"https://x.de/{i}",) for i in range(0, 50, 5)], "url string"
    )
    n = tables.delete_rows(s, p, cand)
    assert n == 10
    left = {r.url for r in tables.read_state(s, p).collect()}
    assert left == {f"https://x.de/{i}" for i in range(50) if i % 5 != 0}


def test_iceberg_state_roundtrip(spark, tmp_path, monkeypatch):
    if not tables.iceberg_ready(spark):
        pytest.skip("Iceberg Spark runtime jars not on the classpath "
                    "(sandbox has none); the switch is config-only")
    # a session created BEFORE the env flip has no graft catalog — build a
    # dedicated one so catalog confs apply
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", str(tmp_path / "wh"))
    s = tables.get_spark(app="iceberg-test", cpus="2", shuffle_partitions=2)
    df = s.createDataFrame([(1, "a")], "id long, v string")
    p = str(tmp_path / "run" / "seen")
    tables.write_state(df, p)
    assert [(r.id, r.v) for r in tables.read_state(s, p).collect()] == [(1, "a")]
    # snapshot-per-write: a second write replaces the visible table state
    tables.write_state(s.createDataFrame([(2, "b")], "id long, v string"), p)
    assert [(r.id, r.v) for r in tables.read_state(s, p).collect()] == [(2, "b")]
