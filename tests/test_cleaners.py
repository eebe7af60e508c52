"""Unit tests for the reference-exact scalar processors (SURVEY.md §2.6,
reference demo_crawl/items.py:12-137) and the xpath-subset engine."""

import datetime

from scrapy_crawler_german_real_estate_sites_spark.functions import cleaners as C
from scrapy_crawler_german_real_estate_sites_spark.functions.xpathlite import doc

RD = datetime.date(2021, 5, 1)


def test_parse_to_number_german_locale():
    # items.py:38-52: de locale, truncate decimals, failure → input unchanged
    assert C.parse_to_number("1.234,56 €") == 1234
    assert C.parse_to_number("450") == 450
    assert C.parse_to_number("1,500") == 1  # de: comma is decimal sep
    assert C.parse_to_number("auf Anfrage") == "auf Anfrage"
    assert C.parse_to_number("") is None
    assert C.parse_to_number(None) is None


def test_parse_to_wg_number():
    # items.py:54-65: only '.' is truncated; a comma survives into int()
    # which raises → the matched token is returned unchanged (quirk)
    assert C.parse_to_wg_number("450,50 €") == "450,50"
    assert C.parse_to_wg_number("450 €") == 450
    assert C.parse_to_wg_number("12.5") == 12
    assert C.parse_to_wg_number("keine") == "keine"


def test_parse_zimmer_or_flache():
    assert C.parse_zimmer_or_flache("3,5 Zimmer") == 3
    assert C.parse_zimmer_or_flache("None") == "None"  # the flache quirk


def test_booleans():
    assert C.booleanconverter("NULL") == 0
    assert C.booleanconverter("0") == 0
    assert C.booleanconverter("Mit Terrasse") == 1
    assert C.booleanconverter(0) == 0
    assert C.haustierconverter(" nein ") == 0
    assert C.haustierconverter("Haustiere: NEIN") == 1  # full-span quirk
    assert C.booleanwgconverter(True) == 1
    assert C.booleanwgconverter("yes") == 0


def test_parse_to_datetime():
    # items.py:105-137
    assert C.parse_to_datetime("ab 01.03.21", RD) == "2021-03-01"
    assert C.parse_to_datetime("15.08.2021", RD) == "2021-08-15"
    assert C.parse_to_datetime("sofort", RD) == "2021-05-01"  # run-date quirk
    assert C.parse_to_datetime("", RD) is None
    # unparseable digits fall through as cleaned string
    assert C.parse_to_datetime("99.99.99", RD) == "99.99.99"


def test_price_en_de_fallback():
    # immonet.py:175-236 (C15): en first, de on failure
    assert C.parse_price_en_de("1,500 €") == 1500
    assert C.parse_price_en_de("1.234,56") == 1  # en parses '1.234' → 1
    assert C.parse_price_en_de("450.000") == 450  # the buy-price quirk


def test_map_compose_take_first():
    proc = C.MapCompose(C.remove_whitespace, C.parse_to_number)
    assert proc(["", "1.200 €"]) == [1200]
    assert C.take_first([None, "", 0, 5]) == 0


def test_xpath_axes():
    d = doc(
        "<div><p>a<span>x</span>b</p><p>c</p></div>"
        "<ul><li class='a'>1</li><li class='a'>2</li><li>3</li></ul>"
    )
    assert d.xpath("//li[@class='a'][2]/text()").get() == "2"
    assert d.xpath("//li[last()]/text()").get() == "3"
    assert d.xpath("//span/ancestor::p/text()[2]").get() == "b"
    assert d.xpath("//p[1]/following::li[1]/text()").get() == "1"
    assert d.xpath("normalize-space(//p[2])").get() == "c"


def test_valid_adresse():
    assert C.valid_adresse("Hauptstr. 5")
    assert not C.valid_adresse("nur text")
    assert C.strasse_guard("x" * 101) == ""
