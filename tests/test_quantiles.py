"""group_quantiles: numpy-reference parity (linear interpolation, edge
quantiles, 1-row and 2-row groups, duplicate values) and plan hygiene
(one exchange, no per-group buffering aggregate, no python-eval)."""

import numpy as np
import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.quantiles import (
    group_quantiles,
)

RNG = np.random.RandomState(7)
GROUPS = {
    "a": RNG.uniform(-50, 50, 101).round(2),   # odd n — exact middle
    "b": RNG.uniform(0, 1000, 100).round(2),   # even n — interpolated
    "c": np.array([42.0]),                     # single row
    "d": np.array([1.0, 2.0]),                 # two rows
    "e": np.array([5.0] * 9 + [6.0]),          # heavy duplicates
}
QS = {"p00": 0.0, "p25": 0.25, "p50": 0.5, "p90": 0.9, "p100": 1.0}


@pytest.fixture(scope="module")
def df(spark):
    rows = [(g, float(v)) for g, vs in GROUPS.items() for v in vs]
    return spark.createDataFrame(rows, ["grp", "value"])


def test_matches_numpy_linear_interpolation(df):
    got = {
        r["grp"]: (r["n"], r["p00"], r["p25"], r["p50"], r["p90"], r["p100"])
        for r in group_quantiles(df, ["grp"], "value", QS).collect()
    }
    assert set(got) == set(GROUPS)
    for g, vs in GROUPS.items():
        n, *ps = got[g]
        assert n == len(vs)
        want = [
            round(float(np.percentile(vs, q * 100, method="linear")), 6)
            for q in QS.values()
        ]
        assert ps == pytest.approx(want, abs=1e-6), g


def test_single_exchange_no_buffering(df):
    plan = (
        group_quantiles(df, ["grp"], "value", {"p50": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    # window + rollup share one HashPartitioning(grp); the whole point of
    # the operator is that nothing buffers a group in memory
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
