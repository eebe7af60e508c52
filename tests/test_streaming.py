"""Structured Streaming parity (SURVEY.md §2.9): draining a static pages
folder through the streaming queries must equal the batch equivalents, and
stateful dup-streak semantics must match a sequential fold."""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_crawler_german_real_estate_sites_spark.streaming import (
    dup_streak_monitor,
    liveness_stream,
    page_rate_metrics,
    stream_pages,
)
from scrapy_crawler_german_real_estate_sites_spark.streaming.stream import (
    run_available_now,
)


@pytest.fixture(scope="module")
def pages_drop(fix_tiny, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_drop")
    shutil.copy(
        os.path.join(fix_tiny, "pages.parquet"), d / "part-000.parquet"
    )
    return str(d)


def test_windowed_rate_matches_batch(spark, pages_drop, tmp_path):
    stream = page_rate_metrics(stream_pages(spark, pages_drop))
    q = (
        stream.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.netloc): (r.pages, r.bytes)
        for r in spark.table("rates").collect()
    }
    batch = (
        spark.read.parquet(pages_drop)
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"),
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("netloc"),
        )
        .agg(F.count("*").alias("pages"),
             F.sum(F.octet_length("html")).alias("bytes"))
        .collect()
    )
    want = {(r.w.start, r.netloc): (r.pages, r.bytes) for r in batch}
    assert got == want and len(got) > 0


def test_liveness_stream_matches_batch(spark, pages_drop, tmp_path):
    out = str(tmp_path / "gone")
    run_available_now(
        liveness_stream(stream_pages(spark, pages_drop)),
        out, str(tmp_path / "ck"),
    )
    got = sorted(r.url for r in spark.read.parquet(out).collect())
    want = sorted(
        r.url
        for r in spark.read.parquet(pages_drop)
        .where(
            F.col("text").contains("Angebot wurde deaktiviert")
            | F.col("text").contains("Objekt nicht mehr verfügbar.")
        )
        .collect()
    )
    assert got == want


def test_liveness_resume_no_duplicates(spark, pages_drop, tmp_path):
    """Same checkpoint dir → second AvailableNow run adds nothing (offsets
    are committed; the streaming face of exact resume)."""
    out = str(tmp_path / "gone2")
    ck = str(tmp_path / "ck2")
    run_available_now(liveness_stream(stream_pages(spark, pages_drop)), out, ck)
    n1 = spark.read.parquet(out).count()
    run_available_now(liveness_stream(stream_pages(spark, pages_drop)), out, ck)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_dup_streak_stateful(spark, tmp_path):
    from scrapy_crawler_german_real_estate_sites_spark.plans.simulator import (
        DUP_STREAK_LIMIT,
    )

    # two seeds: one crosses the 35-streak, one keeps resetting
    rows = []
    for i in range(DUP_STREAK_LIMIT + 5):
        rows.append(("s1", i, True))
    for i in range(50):
        rows.append(("s2", i, i % 3 != 0))  # resets every 3rd event
    src = str(tmp_path / "events")
    spark.createDataFrame(
        rows, "seed_id string, event_seq long, is_dup boolean"
    ).coalesce(1).write.parquet(src)

    events = (
        spark.readStream.schema("seed_id string, event_seq long, is_dup boolean")
        .parquet(src)
    )
    out = str(tmp_path / "streaks")
    run_available_now(
        dup_streak_monitor(events), out, str(tmp_path / "ck3")
    )
    got = (
        spark.read.parquet(out)
        .orderBy("seed_id", "event_seq")
        .toPandas()
    )
    s1 = got[got.seed_id == "s1"]
    # events stop being emitted once the spider stops
    assert len(s1) == DUP_STREAK_LIMIT
    assert bool(s1.iloc[-1].spider_stop) is True
    assert int(s1.iloc[-1].streak) == DUP_STREAK_LIMIT
    s2 = got[got.seed_id == "s2"]
    assert len(s2) == 50
    assert not s2.spider_stop.any()
    # fold check: streak matches a sequential reconstruction
    streak = 0
    for r in s2.itertuples(index=False):
        streak = streak + 1 if (r.event_seq % 3 != 0) else 0
        assert r.streak == streak


def test_dedup_stream_incremental_across_batches(spark, tmp_path):
    """Two micro-batches with overlapping content: batch-2 copies of
    batch-1 content must be swallowed by the checkpointed state, and
    duplicates within one batch collapse to the earliest (warc_ts, url)."""
    import pandas as _pd
    from scrapy_crawler_german_real_estate_sites_spark.streaming.stream import (
        dedup_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, text string"
        ).parquet(str(drop))
        run_available_now(dedup_stream(stream), out, ck)

    t0 = _pd.Timestamp("2021-05-01 06:00:00")
    b1 = _pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "warc_ts": [t0, t0 + _pd.Timedelta(seconds=1), t0],
        "text": ["alpha", "beta", "alpha"],   # u3 duplicates u1 in-batch
    })
    b1.to_parquet(drop / "b1.parquet", coerce_timestamps="us")
    drain()
    got1 = {r.url: r for r in spark.read.parquet(out).collect()}
    # in-batch dup collapsed: earliest (warc_ts, url) wins -> u1 kept
    assert set(got1) == {"u1", "u2"}
    assert got1["u1"].prior_seen == 0

    b2 = _pd.DataFrame({
        "url": ["u4", "u5"],
        "warc_ts": [t0 + _pd.Timedelta(seconds=5)] * 2,
        "text": ["beta", "gamma"],            # u4 duplicates batch-1's u2
    })
    b2.to_parquet(drop / "b2.parquet", coerce_timestamps="us")
    drain()
    got2 = {r.url: r for r in spark.read.parquet(out).collect()}
    # cross-batch dup swallowed by state; only the new content surfaces
    assert set(got2) == {"u1", "u2", "u5"}
    assert got2["u5"].prior_seen == 0
