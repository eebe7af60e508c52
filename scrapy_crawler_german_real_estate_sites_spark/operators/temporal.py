"""Event-time operators: gap sessionization and as-of join.

A crawl engine is an event system — fetches, inserts, alerts, liveness
probes all carry timestamps (the reference's rows do too:
``/root/reference/database.py`` stamps ``inserted``/``last_crawled`` on
every listing and the D11 scan filters on them).  These two operators are
the standard event-time analyses a pipeline at 100 TB needs over such
logs, expressed relationally (no UDFs, no driver loops):

``sessionize``
    Classic gap-based sessions: a new session starts when the gap to the
    user's previous event exceeds ``gap_minutes``.  One window pass
    (lag → break flag → running sum) partitioned by the user key, then a
    per-(user, session) rollup.  Scale shape: the window hash-partitions
    on ``user_id`` — per-user event counts are bounded, so no skew — and
    the follow-up ``groupBy(user_id, session_idx)`` is satisfied by the
    window's own HashPartitioning(user_id) (a subset of the grouping
    keys), so Catalyst inserts NO second exchange.

``asof_join``
    For every left event, the latest right event of the same user at or
    before its timestamp (the "purchase → last prior click" attribution
    shape; same semantics as DuckDB/kdb ``ASOF JOIN`` on
    ``l.user = r.user AND l.ts >= r.ts``).  Spark has no asof-join
    operator for static frames, so this is the sort-merge re-expression:
    tag both sides, union, and take ``last(right payload) IGNORE NULLS``
    over a window ordered by (ts, side) — right rows sort before left
    rows at equal timestamps, giving at-or-before semantics in one
    shuffle of each input (the same single-pass trick pandas
    ``merge_asof`` uses after its sort).  Right rows are first reduced
    to one per (user, ts) — keep max event_id — so ties are
    deterministic on both the engine and the oracle.

Determinism: gaps and waits are integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``); monetary sums go through DECIMAL(18,6) like the
event-stats query, so the DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: (user_id, session_idx, n_events, start_ts,
    end_ts, duration_us, sum_value)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # parquet event logs carry TIMESTAMP_NTZ; the session tz is pinned to
    # UTC (sources/tables.py), so this cast is the exact UTC instant
    ts = F.col(ts_col).cast("timestamp")
    sess = (
        events.select(
            F.col(user_col).alias("user_id"),
            ts.alias("ts"),
            F.unix_micros(ts).alias("tus"),
            F.col(value_col).alias("value"),
            F.col(id_col).alias("event_id"),
        )
        # two projections: a window function may not nest inside another
        .withColumn("prev_tus", F.lag("tus").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev_tus").isNull()
                | (F.col("tus") - F.col("prev_tus") > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_idx", F.sum("brk").over(run))
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.max("tus") - F.min("tus")).alias("duration_us"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
        ).alias("sum_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Left as-of join: every left row plus the latest right row of the
    same user with ``right.ts <= left.ts`` (NULLs when none precede).

    Returns (left_id, user_id, left_ts, right_id, right_ts, wait_us).
    """
    # NTZ-safe (see sessionize); one right row per (user, ts): max id —
    # deterministic tie rule
    ts = F.col(ts_col).cast("timestamp")
    r = right.groupBy(
        F.col(user_col).alias("user_id"), ts.alias("ts")
    ).agg(F.max(id_col).alias("rid"))
    l = left.select(
        F.col(user_col).alias("user_id"),
        ts.alias("ts"),
        F.col(id_col).alias("lid"),
    )
    # side=0 sorts right rows before left rows at equal ts → at-or-before
    tagged = r.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("lid"),
        F.struct(F.col("rid"), F.col("ts").alias("rts")).alias("rpay"),
    ).unionByName(
        l.select(
            "user_id",
            "ts",
            F.lit(1).alias("side"),
            "lid",
            F.lit(None)
            .cast("struct<rid:long,rts:timestamp>")
            .alias("rpay"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "lid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged.withColumn(
        "last_r", F.last("rpay", ignorenulls=True).over(w)
    ).where(F.col("side") == 1)
    return matched.select(
        F.col("lid").alias("left_id"),
        "user_id",
        F.col("ts").alias("left_ts"),
        F.col("last_r.rid").alias("right_id"),
        F.col("last_r.rts").alias("right_ts"),
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_r.rts"))
        ).alias("wait_us"),
    )


def capture_diff(
    a: DataFrame,
    b: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Per-host crawl-snapshot delta: what changed between two captures.

    The recrawl scheduler's core input (Cho & Garcia-Molina, VLDB 2000
    estimate change rates from exactly this signal): given capture A and
    capture B of the same web slice, classify every URL as added /
    removed / changed / unchanged (content compared by md5, so the wide
    html/text columns never cross the diff shuffle — only 32-byte
    hashes) and roll the churn up per host.

    Scale shape: one full-outer equi-join on url — the inherent diff
    exchange — carrying (url, hash) pairs only; the host rollup is
    map-side combinable.  ``churn`` = (added+removed+changed)/total.
    """
    fa = a.select(
        F.col(url_col).alias("url"), F.md5(F.col(content_col)).alias("ha")
    )
    fb = b.select(
        F.col(url_col).alias("url"), F.md5(F.col(content_col)).alias("hb")
    )
    j = fa.join(fb, "url", "full_outer")
    status = (
        F.when(F.col("ha").isNull(), "added")
        .when(F.col("hb").isNull(), "removed")
        .when(F.col("ha") != F.col("hb"), "changed")
        .otherwise("unchanged")
    )
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    base = j.select(host.alias("host"), status.alias("status"))

    def cnt(s: str):
        return F.sum((F.col("status") == s).cast("int")).cast("bigint")

    n = F.count("*")
    return base.groupBy("host").agg(
        cnt("added").alias("n_added"),
        cnt("removed").alias("n_removed"),
        cnt("changed").alias("n_changed"),
        cnt("unchanged").alias("n_unchanged"),
        F.round(
            F.sum((F.col("status") != "unchanged").cast("int")) / n, 4
        ).alias("churn"),
    )
