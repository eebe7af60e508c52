"""Spider-trap triage: each heuristic fires on its planted trap shape
and stays quiet on clean portal URLs."""

from scrapy_crawler_german_real_estate_sites_spark.operators.traps import (
    trap_report, url_trap_features,
)


def _features(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    f = url_trap_features()
    return {
        r["url"]: r
        for r in df.select("url", *[c.alias(n) for n, c in f.items()]).collect()
    }


def test_clean_urls_not_flagged(spark):
    rows = _features(spark, [
        "https://www.immonet.de/angebot/400000001",
        "https://www.immonet.de/immobiliensuche/sel.do?city=400&suchart=mieten&objecttype=wohnung&page=1",
        "https://www.berlin.de/special/immobilien/wohnung/mieten/",
    ])
    for r in rows.values():
        assert not r["trap_suspect"], r


def test_deep_path_flagged(spark):
    u = "https://t.example/" + "/".join(f"s{i}" for i in range(9))
    r = _features(spark, [u])[u]
    assert r["depth"] == 9 and r["trap_suspect"]


def test_loop_segments_flagged(spark):
    u = "https://t.example/a/b/a/b/c"
    r = _features(spark, [u])[u]
    assert r["dup_segs"] == 2 and r["trap_suspect"]
    # a single repeat is tolerated (common in legit category/slug paths)
    u2 = "https://t.example/a/b/a"
    assert not _features(spark, [u2])[u2]["trap_suspect"]


def test_param_explosion_flagged(spark):
    u = "https://t.example/search?a=1&b=2&c=3&d=4&e=5&f=6"
    r = _features(spark, [u])[u]
    assert r["n_params"] == 6 and r["trap_suspect"]


def test_calendar_flagged(spark):
    u = "https://t.example/archive/2021/05/page"
    r = _features(spark, [u])[u]
    assert r["calendar"] and r["trap_suspect"]
    # fragment-only years don't fire
    u2 = "https://t.example/product/2021-05"
    assert not _features(spark, [u2])[u2]["calendar"]


def test_report_rollup(spark):
    urls = (
        [f"https://clean.example/item/{i}" for i in range(8)]
        + ["https://trap.example/" + "/".join(["x"] * 10)] * 2
        + ["https://trap.example/ok"]
    )
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rep = {r["host"]: r for r in trap_report(df).collect()}
    assert rep["clean.example"]["n_suspect"] == 0
    t = rep["trap.example"]
    assert t["n_urls"] == 3 and t["n_suspect"] == 2 and t["n_deep"] == 2
    assert abs(t["suspect_share"] - 0.6667) < 1e-9
