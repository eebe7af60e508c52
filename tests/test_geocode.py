"""Tests for the optional geocode enrichment joins (operators/geocode.py,
J3/J4 — the reference's helpers are dead code; these are the intended
lookups as declarative broadcast joins)."""

from scrapy_crawler_german_real_estate_sites_spark.operators.geocode import (
    enrich_listings,
    resolve_suburb_stadtid,
)


def test_resolve_suburb_stadtid(spark):
    geocache = spark.createDataFrame(
        [
            ("Eichenstraße 19, Amberg", 48.1, 10.2, "Altstadt"),
            ("Lindenweg 3, Bonn", 48.3, 10.4, "Südstadt"),
            ("Ahornallee 7, Celle", 48.5, 10.6, "Niemandsland"),  # unknown
        ],
        "address string, lat double, lon double, suburb string",
    )
    stadte = spark.createDataFrame(
        [
            (400, "Amberg", ["Altstadt", "Neustadt"]),
            (401, "Bonn", ["Südstadt"]),
            (402, "Bonn2", ["Südstadt"]),  # ambiguous suburb → min id wins
        ],
        "id int, stadt string, stadtviertel array<string>",
    )
    got = {r.address: r.stadtid for r in resolve_suburb_stadtid(geocache, stadte).collect()}
    # unknown suburb dropped (inner join = helper's no-result path)
    assert got == {"Eichenstraße 19, Amberg": 400, "Lindenweg 3, Bonn": 401}


def test_enrich_listings_address_normalization(spark):
    listings = spark.createDataFrame(
        [
            (1, "Amberg, Eichenstraße 19"),   # pipeline layout: city, street
            (2, "Bonn, Lindenweg 3"),
            (3, "Celle, Unbekannt 1"),        # cache miss → NULL coords
        ],
        "listing_id long, strasse string",
    )
    geocache = spark.createDataFrame(
        [
            ("Eichenstraße 19, Amberg", 48.1, 10.2, "Altstadt"),
            ("Lindenweg 3, Bonn", 48.3, 10.4, "Südstadt"),
        ],
        "address string, lat double, lon double, suburb string",
    )
    got = {r.listing_id: (r.lat, r.lon, r.suburb)
           for r in enrich_listings(listings, geocache).collect()}
    assert got[1] == (48.1, 10.2, "Altstadt")
    assert got[2] == (48.3, 10.4, "Südstadt")
    assert got[3] == (None, None, None)
    assert len(got) == 3  # left join keeps unmatched listings
