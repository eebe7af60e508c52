"""sessionize / asof_join: python-reference parity on constructed edge
cases (gap boundaries, equal-ts ties, no-prior-match NULLs) and plan
hygiene (single exchange for sessionize, no python-eval nodes)."""

import datetime as dt

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.temporal import (
    asof_join,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


EVENTS = [
    # (event_id, ts, user_id, event_type, value)
    # user 1: three sessions — gap exactly 30min stays, 30min+1us breaks
    (1, _ts(0), 1, "click", 1.0),
    (2, _ts(30), 1, "view", 2.0),          # 30:00 gap → same session
    (3, _ts(60, 1), 1, "purchase", 3.0),   # 30:00.000001 gap → new session
    (4, _ts(200), 1, "purchase", 4.0),     # new session
    # user 2: single event; purchase with NO prior click
    (5, _ts(10), 2, "purchase", 5.0),
    # user 3: equal-ts tie — click at the same instant as the purchase
    # matches (at-or-before), and of two equal-ts clicks max id wins
    (6, _ts(5), 3, "click", 1.5),
    (7, _ts(5), 3, "click", 2.5),
    (8, _ts(5), 3, "purchase", 6.0),
    (9, _ts(99), 3, "click", 0.5),         # after → never matched
]


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(
        [(i, t, u, k, v) for i, t, u, k, v in EVENTS],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


def test_sessionize_known_answer(events_df):
    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["start_ts"],
            r["end_ts"],
            r["duration_us"],
            r["sum_value"],
        )
        for r in sessionize(events_df, gap_minutes=30).collect()
    }
    assert got == {
        (1, 1): (2, _ts(0), _ts(30), 30 * 60 * 1_000_000, 3.0),
        (1, 2): (1, _ts(60, 1), _ts(60, 1), 0, 3.0),
        (1, 3): (1, _ts(200), _ts(200), 0, 4.0),
        (2, 1): (1, _ts(10), _ts(10), 0, 5.0),
        (3, 1): (3, _ts(5), _ts(5), 0, 10.0),
        (3, 2): (1, _ts(99), _ts(99), 0, 0.5),
    }


def test_sessionize_single_exchange(events_df):
    # window + rollup share one HashPartitioning(user_id): the groupBy
    # keys are a superset, so Catalyst must not add a second exchange
    plan = (
        sessionize(events_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_known_answer(events_df):
    from pyspark.sql import functions as F

    got = {
        r["left_id"]: (r["right_id"], r["right_ts"], r["wait_us"])
        for r in asof_join(
            events_df.where(F.col("event_type") == "purchase"),
            events_df.where(F.col("event_type") == "click"),
        ).collect()
    }
    assert got == {
        3: (1, _ts(0), 60 * 60 * 1_000_000 + 1),  # user 1, click at t0
        4: (1, _ts(0), 200 * 60 * 1_000_000),
        5: (None, None, None),                    # user 2: no prior click
        8: (7, _ts(5), 0),                        # equal-ts, max-id click
    }


def test_asof_matches_pandas_merge_asof(spark):
    # randomized cross-check vs pandas' reference implementation
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
            "user_id": rng.integers(0, 12, n),
            "event_type": rng.choice(["click", "purchase"], n),
            "value": rng.random(n),
        }
    )
    # unique (user, ts) per side keeps pandas' tie rules out of scope
    pdf = pdf.drop_duplicates(["user_id", "event_type", "ts"])
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (
        asof_join(
            df.where(F.col("event_type") == "purchase"),
            df.where(F.col("event_type") == "click"),
        )
        .toPandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    left = (
        pdf[pdf.event_type == "purchase"]
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )
    right = (
        pdf[pdf.event_type == "click"]
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left,
            right.rename(
                columns={"event_id": "right_id", "ts": "right_ts"}
            )[["right_id", "right_ts", "user_id"]],
            left_on="ts",
            right_on="right_ts",
            by="user_id",
            direction="backward",
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["left_id"]) == list(want["event_id"])
    assert [
        None if pd.isna(x) else int(x) for x in want["right_id"]
    ] == [None if pd.isna(x) else int(x) for x in got["right_id"]]


def test_asof_plan_has_no_python_eval(events_df):
    from pyspark.sql import functions as F

    plan = (
        asof_join(
            events_df.where(F.col("event_type") == "purchase"),
            events_df.where(F.col("event_type") == "click"),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# capture diff (recrawl delta)
# ---------------------------------------------------------------------------

def test_capture_diff_classifies_all_four(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.temporal import (
        capture_diff,
    )

    a = spark.createDataFrame(
        [
            ("https://h1.x/keep", "same"),
            ("https://h1.x/edit", "old content"),
            ("https://h1.x/gone", "bye"),
        ],
        ["url", "text"],
    )
    b = spark.createDataFrame(
        [
            ("https://h1.x/keep", "same"),
            ("https://h1.x/edit", "new content"),
            ("https://h1.x/new", "hi"),
        ],
        ["url", "text"],
    )
    r = {row["host"]: row for row in capture_diff(a, b).collect()}["h1.x"]
    assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) == (
        1, 1, 1, 1,
    )
    assert abs(r["churn"] - 0.75) < 1e-9


def test_capture_diff_per_host_isolation(spark):
    from scrapy_crawler_german_real_estate_sites_spark.operators.temporal import (
        capture_diff,
    )

    a = spark.createDataFrame(
        [("https://a.x/1", "t"), ("https://b.x/1", "t")], ["url", "text"]
    )
    b = spark.createDataFrame([("https://a.x/1", "t")], ["url", "text"])
    got = {r["host"]: r for r in capture_diff(a, b).collect()}
    assert got["a.x"]["n_unchanged"] == 1 and got["a.x"]["churn"] == 0.0
    assert got["b.x"]["n_removed"] == 1 and got["b.x"]["churn"] == 1.0
