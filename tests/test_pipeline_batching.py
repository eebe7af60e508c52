"""pipeline_pass must be invariant to Arrow batch boundaries.

The pass runs as mapInPandas over seed-sorted partitions with
cross-batch group continuation (plans/crawl.py:pipeline_pass) — a seed
whose rows span two Arrow batches is held back and re-joined.  The
pytest fixture tiers have waves smaller than one default Arrow batch
(10k rows), so the parity suites never split a seed; this test forces
1-row through 7-row batches over seeds with budget cut-offs,
spider-stop drains and failure streaks landing ON batch boundaries and
asserts byte-identical output vs one-giant-batch execution."""

import datetime
import json

import pytest

from scrapy_crawler_german_real_estate_sites_spark.operators.parse_batch import (
    PARSED_SCHEMA,
)
from scrapy_crawler_german_real_estate_sites_spark.plans.crawl import (
    pipeline_pass,
)

RUN_TS = datetime.datetime(2021, 5, 1, 7, 0, 0)
STADTE = {77: {"id": 77, "stadt": "Teststadt", "Stadtviertel": ["A", "B"]}}


def _item(url, ok=True, kosten=500):
    d = {
        "url": url, "title": "T", "stadtid": 77, "haus": 1,
        "images": ["i.jpg"], "gesamtkosten": kosten if ok else "kaputt",
        "kaufen": 1,
    }
    return json.dumps(d, sort_keys=True, ensure_ascii=False)


def _rows(n_seeds=11, rows_per_seed=9, items_per_row=2):
    """Synthetic parsed rows: page rows with items + links, fifo-ordered.
    Failure items (non-int gesamtkosten) sprinkled so the running
    stop_condition crosses batch boundaries."""
    rows = []
    for s in range(n_seeds):
        sid = f"seed_{s:03d}"
        for i in range(rows_per_seed):
            url = f"https://ex.de/{sid}/{i}"
            items = [
                {
                    "kind": "detail",
                    "item_json": _item(
                        f"{url}#it{j}", ok=((s + i + j) % 4 != 0)
                    ),
                }
                for j in range(items_per_row)
            ]
            links = [
                {
                    "url": f"{url}/next{j}", "kind": "detail", "seq": j,
                    "dup_check": True, "meta": "{}",
                }
                for j in range(2)
            ]
            rows.append(
                (sid, i, url, "listing" if i % 3 == 0 else "detail",
                 "ex.de", 0, True, items, links)
            )
    return rows


def _run(spark, arrow_batch):
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch)
    )
    try:
        parsed = spark.createDataFrame(_rows(), schema=PARSED_SCHEMA)
        # tight budgets so cut-offs land mid-seed; one seed pre-stopped
        snap = {
            f"seed_{s:03d}": (
                0 if s % 3 else 5, 3 if s % 2 else 0, s == 4, 12
            )
            for s in range(11)
        }
        bc = spark.sparkContext.broadcast(snap)
        out = pipeline_pass(parsed, bc, STADTE, RUN_TS)
        # links no longer flow through the pass (they bypass the exchange
        # and are gated by the engine's broadcast semi-join on the
        # effective page set) — the pass output is the state machine's
        rows = sorted(
            (r.seed_id, r.fifo_seq, r.item_idx, r.kind, str(r.counted),
             str(r.effective), str(r.item_json), str(r.doc_json),
             str(r.seen_url), str(r.alert), str(r.failure))
            for r in out.collect()
        )
        bc.unpersist()
        return rows
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


@pytest.mark.parametrize("arrow_batch", [1, 4, 7])
def test_pipeline_pass_invariant_to_arrow_batch_size(spark, arrow_batch):
    golden = _run(spark, 100000)  # one batch per partition
    split = _run(spark, arrow_batch)
    assert split == golden
    # sanity: the pass actually produced state + item + page rows
    kinds = {k for (_, _, _, k, *_rest) in golden}
    assert "__state__" in kinds and "__item__" in kinds
