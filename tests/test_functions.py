"""Unit tests for the scalar column-function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark.functions import (
    char_ngrams,
    clean_string,
    normalize_string_date,
    nt_statement,
    parse_string_date,
    structured_date_str,
    token_shingles,
    year_of_default_time,
)


def _one(spark, col, rows, schema):
    return [r["out"] for r in spark.createDataFrame(rows, schema).select(col.alias("out")).collect()]


def test_clean_string(spark):
    rows = [("x",), ("null",), ("",), ("  ",), (None,), (" ok ",)]
    got = _one(spark, clean_string("v"), rows, "v string")
    assert got == ["x", None, None, None, None, " ok "]


def test_normalize_and_parse_string_date(spark):
    rows = [
        ("2013-04-05",),
        ("2013-04-05T06:07:08.00Z",),
        ("2013-04-05T06:07:08.00+02:00",),
        ("garbage",),
        (None,),
    ]
    norm = _one(spark, normalize_string_date("v"), rows, "v string")
    assert norm[0] == "2013-04-05T00:00:00.00Z"
    assert norm[1] == "2013-04-05T06:07:08.00Z"
    assert norm[2] == "2013-04-05T06:07:08.00"
    parsed = _one(spark, parse_string_date("v"), rows, "v string")
    assert parsed[0] is not None and parsed[1] is not None and parsed[2] is not None
    assert parsed[3] is None and parsed[4] is None  # counted, not fatal


def test_structured_date_and_year(spark):
    rows = [(2013, 4, 5)]
    got = _one(
        spark, structured_date_str("y", "m", "d"), rows, "y int, m int, d int"
    )
    assert got == ["2013-04-05"]
    got = _one(spark, year_of_default_time("v"), [("2013-01-01 00:00:00",)], "v string")
    assert got == [2013]


def test_nt_statement_escaping(spark):
    rows = [
        ("http://x/s", "http://x/p", 'a "quote"\nand\\slash\t!', "literal", None, None),
        ("http://x/s", "http://x/p", "http://x/o", "uri", None, None),
        ("http://x/s", "http://x/p", "42", "literal", "http://www.w3.org/2001/XMLSchema#int", None),
        ("http://x/s", "http://x/p", "hi", "literal", None, "en"),
    ]
    schema = "s string, p string, o string, o_kind string, o_datatype string, o_lang string"
    got = _one(spark, nt_statement(), rows, schema)
    assert got[0] == '<http://x/s> <http://x/p> "a \\"quote\\"\\nand\\\\slash\\t!" .'
    assert got[1] == "<http://x/s> <http://x/p> <http://x/o> ."
    assert got[2] == '<http://x/s> <http://x/p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .'
    assert got[3] == '<http://x/s> <http://x/p> "hi"@en .'


def test_char_ngrams_and_shingles(spark):
    got = _one(spark, char_ngrams("v", 3), [("Japan",), ("ab",)], "v string")
    assert got[0] == ["jap", "apa", "pan"]
    assert got[1] == ["ab"]
    got = _one(spark, token_shingles("v", 2), [("a b c",)], "v string")
    assert got[0] == ["a b", "b c"]


def test_uri_minting(spark):
    from linkedspending_spark import uris as U

    rows = [("fx-2013", "amount")]
    df = spark.createDataFrame(rows, "ds string, f string")
    r = df.select(
        U.dataset_uri("ds").alias("d"),
        U.dsd_uri("ds").alias("m"),
        U.property_uri("ds", "f").alias("p"),
        U.spec_uri(U.property_uri("ds", "f")).alias("sp"),
        U.observation_uri("ds", F.lit("17")).alias("o"),
    ).collect()[0]
    assert r["d"] == "http://linkedspending.aksw.org/instance/fx-2013"
    assert r["m"] == "http://linkedspending.aksw.org/instance/fx-2013/model"
    assert r["p"] == "http://linkedspending.aksw.org/ontology/fx-2013-amount"
    assert r["sp"] == "http://linkedspending.aksw.org/ontology/fx-2013-amount-spec"
    assert r["o"] == "http://linkedspending.aksw.org/instance/observation-fx-2013-17"
    # string twins agree
    assert U.dataset_uri_str("fx-2013") == r["d"]
    assert U.property_uri_str("fx-2013", "amount") == r["p"]
