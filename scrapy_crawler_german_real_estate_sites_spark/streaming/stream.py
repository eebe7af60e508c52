"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-cron (scheduler.txt:1-2) — two crawls a day — so no
streaming operator is *required* by the north rule.  These are the
streaming-native re-expressions of its streaming-ish semantics for a
continuously-arriving pages feed (e.g. a WARC ingestion drop folder):

* ``page_rate_metrics`` — event-time windowed fetch-rate per netloc with a
  watermark for late pages (the AutoThrottle P3 signal, settings.py:95-99,
  computed from data instead of per-request latency callbacks).
* ``liveness_stream`` — the checkStadt sweep (checkStadt.py:26-57) as a
  continuous query: dead-listing markers → urls-to-delete append stream.
* ``dup_streak_monitor`` — the duplicate-streak spider stop (D3/A3,
  pipelines.py:363-369: 35 consecutive duplicate errors close the spider)
  as a custom stateful operator over an event stream, via
  ``applyInPandasWithState``.

All are micro-batch queries; drain a static folder exactly once with
``.trigger(availableNow=True)`` (tests do this and compare to the batch
equivalents).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

GONE_MARKERS = (
    # checkStadt.py:26-57 per-domain dead-listing text markers
    "Angebot wurde deaktiviert",
    "Objekt nicht mehr verfügbar.",
)


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int = None) -> DataFrame:
    """File-source stream over a pages drop folder (input_hint shape)."""
    r = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(pages_dir)


def page_rate_metrics(pages: DataFrame, window: str = "1 hour",
                      watermark: str = "30 minutes") -> DataFrame:
    """Watermarked per-netloc fetch counts per event-time window.  Late
    pages (warc_ts older than the watermark) are dropped, on-time stragglers
    update their window — standard event-time semantics."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("netloc"),
        )
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.octet_length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "netloc", "pages", "bytes",
        )
    )


def liveness_stream(pages: DataFrame) -> DataFrame:
    """Continuous checkStadt sweep: pages whose text carries a dead-listing
    marker → (url, marker) rows for MERGE-delete against listings (D9)."""
    marker = F.array(*[F.lit(m) for m in GONE_MARKERS])
    hit = F.filter(marker, lambda m: F.col("text").contains(m))
    return (
        pages.select("url", "warc_ts", hit.alias("hits"))
        .where(F.size("hits") > 0)
        .select("url", "warc_ts", F.col("hits")[0].alias("marker"))
    )


_STREAK_STATE = "streak int, stopped boolean"
_STREAK_OUT = (
    "seed_id string, event_seq long, streak int, spider_stop boolean"
)


def _streak_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-seed running duplicate streak with the reference's reset-on-
    success and stop-at-35 semantics (pipelines.py:26,363-369,397)."""
    from ..plans.simulator import DUP_STREAK_LIMIT

    if state.exists:
        streak, stopped = state.get
    else:
        streak, stopped = 0, False
    out = []
    for pdf in pdfs:
        for row in pdf.sort_values("event_seq").itertuples(index=False):
            if stopped:
                continue
            streak = streak + 1 if row.is_dup else 0
            if streak >= DUP_STREAK_LIMIT:
                stopped = True
            out.append((key[0], int(row.event_seq), streak, stopped))
    state.update((streak, stopped))
    yield pd.DataFrame(
        out, columns=["seed_id", "event_seq", "streak", "spider_stop"]
    )


def dup_streak_monitor(events: DataFrame) -> DataFrame:
    """events: streaming (seed_id string, event_seq long, is_dup boolean).
    Emits the running streak per event and the spider-stop flag, keeping
    per-seed state across micro-batches (custom stateful operator — the
    Spark form of the reference's in-process counters)."""
    return events.groupBy("seed_id").applyInPandasWithState(
        _streak_fn,
        outputStructType=_STREAK_OUT,
        stateStructType=_STREAK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, out_dir: str, ckpt_dir: str,
                      output_mode: str = "append"):
    """Drain whatever is currently in the source exactly once to a parquet
    sink (Trigger.AvailableNow) and block until done.  Restarting with the
    same checkpoint dir resumes from the recorded offsets — the streaming
    face of the engine's resume guarantee."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_SEEN_STATE = "n_seen long"
_SEEN_OUT = "content_md5 string, url string, warc_ts timestamp, prior_seen long"


def _first_seen_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-content-hash dedup state: emit each NEW row exactly once (with
    how many copies were already seen — 0 for a true first sight), swallow
    every later copy.  State is one long per distinct content hash."""
    n_seen = state.get[0] if state.exists else 0
    out = []
    for pdf in pdfs:
        for row in pdf.sort_values(["warc_ts", "url"]).itertuples(index=False):
            if n_seen == 0:
                out.append((key[0], row.url, row.warc_ts, 0))
            n_seen += 1
    state.update((n_seen,))
    yield pd.DataFrame(
        out, columns=["content_md5", "url", "warc_ts", "prior_seen"]
    )


def dedup_stream(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Incremental exact dedup at ingest — the streaming face of
    ``operators/dedup.py:dedup_exact``: a continuously-arriving page/doc
    stream is keyed by content md5 and only the first copy of each
    content survives, across micro-batches and restarts (the dedup state
    rides the checkpoint).  The batch dedup reprocesses the corpus per
    run; this keeps a 100 TB ingest incremental — each new page costs one
    state lookup, not a corpus-wide groupBy.

    Scale shape: ``applyInPandasWithState`` state is hash-partitioned by
    the content key across executors (the same sharding as the batch
    groupBy), so state size per task is bounded by its key range and a
    hot duplicate only ever touches one task's single counter row.

    Input: streaming (url, warc_ts, <text_col>).  Output: append-mode
    (content_md5, url, warc_ts, prior_seen) — one row per distinct
    content, ``prior_seen`` > 0 only when an earlier micro-batch's state
    already held copies (possible after at-least-once replays; 0 in
    exactly-once runs).
    """
    keyed = pages.select(
        F.md5(F.col(text_col)).alias("content_md5"), "url", "warc_ts"
    )
    return keyed.groupBy("content_md5").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=_SEEN_OUT,
        stateStructType=_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
