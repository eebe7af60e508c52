"""Geocode enrichment (SURVEY.md J3/J4).

The reference defines geocoding helpers that are DEAD CODE — they have no
call sites: ``getLanLonMapQuest`` / ``ermittleStadtvidFromSuburb``
(/root/reference/demo_crawl/pipelines.py:31-100) are never invoked from
``process_item``, and the ``getStadtVid`` they reference doesn't exist.
The live item path therefore performs NO geocoding (faithfully mirrored by
the engine's pipeline pass).  This module re-expresses the helpers as
OPTIONAL declarative enrichment joins over the deterministic ``geocache``
fixture table, for callers who want the lookups the reference intended:

* :func:`resolve_suburb_stadtid` — ``ermittleStadtvidFromSuburb``: suburb
  → city id via the stadte ``stadtviertel`` membership lists (broadcast
  dim join; the min id is taken for determinism when a suburb name occurs
  in several cities).
* :func:`enrich_listings` — ``getLanLonMapQuest``: listing address →
  (lat, lon, suburb) via a broadcast equi-join against the geocache
  (which plays the MapQuest response cache, pipelines.py:38-49).

Scale: both dims (geocache, stadte) are broadcast — listings never
shuffle for enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_suburb_stadtid(geocache: DataFrame, stadte: DataFrame) -> DataFrame:
    """(address, lat, lon, suburb, stadtid) for every geocache row whose
    suburb appears in some city's stadtviertel list (inner join: the
    reference helper returns nothing for unknown suburbs).

    The membership predicate is normalized to an EQUI-join by exploding
    the dim's stadtviertel lists into (stadtid, suburb) rows: an
    ``array_contains`` theta-join can only plan as a broadcast
    nested-loop (every fact row scans every city), while the exploded dim
    hash-joins — same tiny broadcast, O(1) probe per fact row."""
    st = F.broadcast(
        stadte.select(
            F.col("id").alias("stadtid"),
            F.explode("stadtviertel").alias("suburb"),
        )
    )
    return (
        geocache.join(st, "suburb", "inner")
        .groupBy("address", "lat", "lon", "suburb")
        .agg(F.min("stadtid").cast("long").alias("stadtid"))
    )


def enrich_listings(
    listings: DataFrame, geocache: DataFrame, strasse_col="strasse"
) -> DataFrame:
    """Left-enrich listings with (lat, lon, suburb) from the geocache.

    The pipeline stores ``strasse`` as ``"{stadt}, {street} {no}"``
    (reference pipelines.py item assembly) while the geocache keys on
    ``"{street} {no}, {stadt}"`` — normalize by swapping the two
    comma-separated halves before the broadcast join.  Unmatched rows
    keep NULL coords (the reference helper's cache-miss path would have
    called MapQuest; offline there is no fallback)."""
    parts = F.split(F.col(strasse_col), ", ", 2)
    key = F.concat_ws(", ", F.element_at(parts, 2), F.element_at(parts, 1))
    g = F.broadcast(
        geocache.select(
            F.col("address").alias("__geo_address"), "lat", "lon", "suburb"
        )
    )
    return listings.withColumn("__geo_address", key).join(
        g, "__geo_address", "left"
    ).drop("__geo_address")
