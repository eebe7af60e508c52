"""Vectorized fetch+parse operator (SURVEY.md §2.5 mapping).

One Arrow-batched ``mapInPandas`` pass dispatches each fetched page to its
portal parser (``operators/portals``) — reproducing the reference spiders'
parse callbacks — and emits, per page, the extracted items (canonical JSON
text each, in a native struct array) and the extracted links (native
struct array).  This is the only
Python on the hot path; everything before (politeness/budget selection,
fetch join) and after (dedup anti-join, frontier append) is native Spark.

The per-row invariant (BASELINE.json:input_hint): ``item_json`` is
byte-identical to the offline simulator's canonical item text per url.
"""

from __future__ import annotations

import datetime
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# items/links travel as NATIVE Arrow struct arrays between the parse pass,
# the pipeline pass and the link explosion — a json-string encoding here
# costs a full encode+decode round-trip per wave on the measured hot path
# (parse is the bottleneck stage).  item_json itself stays a canonical JSON
# STRING: byte-identity per item is the correctness contract
# (BASELINE.json:input_hint), so the item payload is opaque bytes to Spark.
LINK_SCHEMA = (
    "array<struct<url:string, kind:string, seq:int, dup_check:boolean, "
    "meta:string>>"
)

PARSED_SCHEMA = (
    "seed_id string, fifo_seq long, url string, kind string, "
    "netloc string, partition_id int, parse_ok boolean, "
    "items array<struct<kind:string, item_json:string>>, "
    f"links {LINK_SCHEMA}"
)


def parse_pages(batch_df: DataFrame, run_date: datetime.date,
                ctx_bc=None) -> DataFrame:
    """batch_df columns: seed_id, fifo_seq, url, kind, netloc, meta (json),
    html (binary).

    ``ctx_bc`` is a SparkContext.broadcast of
    ``{seed_id: (portal, stadtid, stadtname, haus, kaufen, chatid, hour,
    seed_url, stadtviertel)}`` — shipped to workers ONCE per run instead of
    re-broadcasting a seed-ctx join every wave (per-wave broadcast builds
    are pure serial driver time; at 10^5 seeds the dict is a few MB).

    Returns PARSED_SCHEMA rows (one per input page)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        from .portals import get_portal
        from .portals.base import SeedCtx
        from ..plans.simulator import canonical_item_text

        ctx_map = ctx_bc.value
        ctx_cache = {}

        def ctx_for(seed_id):
            c = ctx_cache.get(seed_id)
            if c is None:
                t = ctx_map[seed_id]
                c = SeedCtx(
                    seed_id=seed_id, portal=t[0], stadtid=t[1],
                    stadtname=t[2], haus=t[3], kaufen=t[4], chatid=t[5],
                    hour=t[6], url=t[7], run_date=run_date,
                    stadtviertel=t[8],
                    progress_counter=t[9] if len(t) > 9 else 0,
                )
                ctx_cache[seed_id] = c
            return c

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            out = {k: [] for k in (
                "seed_id", "fifo_seq", "url", "kind", "netloc", "partition_id",
                "parse_ok", "items", "links")}
            for row in pdf.itertuples(index=False):
                ctx = ctx_for(row.seed_id)
                meta = json.loads(row.meta) if row.meta else {}
                items = []
                links = []
                ok = True
                try:
                    body = bytes(row.html).decode("utf-8")
                    pr = get_portal(ctx.portal).parse(
                        row.kind, body, row.url, meta, ctx
                    )
                    items = [
                        {"kind": kind, "item_json": canonical_item_text(it)}
                        for it, kind in pr.items
                    ]
                    links = [
                        {
                            "url": lk.url,
                            "kind": lk.kind,
                            "seq": lk.seq,
                            "dup_check": lk.dup_check,
                            "meta": json.dumps(lk.meta, sort_keys=True),
                        }
                        for lk in pr.links
                    ]
                except Exception:
                    # spider-level try/except swallows parse errors (e.g.
                    # immonet.py:117-119) — page yields nothing
                    ok = False
                out["seed_id"].append(row.seed_id)
                out["fifo_seq"].append(row.fifo_seq)
                out["url"].append(row.url)
                out["kind"].append(row.kind)
                out["netloc"].append(row.netloc)
                out["partition_id"].append(pid)
                out["parse_ok"].append(ok)
                out["items"].append(items)
                out["links"].append(links)
            yield pd.DataFrame(out)

    return batch_df.mapInPandas(run, schema=PARSED_SCHEMA)


def explode_links(parsed: DataFrame) -> DataFrame:
    """Native link explosion: links struct array → one row per link
    (F1–F14 output).  No from_json — links arrive as Arrow structs."""
    return (
        parsed.select(
            "seed_id",
            F.col("fifo_seq").alias("parent_fifo_seq"),
            F.explode(F.col("links")).alias("lk"),
        )
        .select(
            "seed_id",
            "parent_fifo_seq",
            F.col("lk.url").alias("url"),
            F.col("lk.kind").alias("kind"),
            F.col("lk.seq").alias("seq"),
            F.col("lk.dup_check").alias("dup_check"),
            F.col("lk.meta").alias("meta"),
        )
    )
