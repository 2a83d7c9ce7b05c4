"""Reference-parity tests for the OpenSpending-shaped dataset converter.

Positive fixture exercises all five component types, the amount→measure
rule, the string-date heuristic, int-parse fallback, compound nulls,
date-parse errors, territories, default year, and completeness; compared
exactly against the independent golden oracle. Negative fixtures cover
the rejection rules (ConvertWorker.java:205-223,533-535,546-550,626-641).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from linkedspending_spark.operators.convert_dataset import convert_dataset
from linkedspending_spark.plans.components import (
    DatasetMeta,
    DatasetRejectedError,
    UnknownMappingTypeError,
    compile_plan,
)
from linkedspending_spark.sources.dictionaries import country_pairs, currency_pairs

from .golden_dataset import golden_dataset_triples

MAPPING = [
    {"name": "amount", "type": "attribute", "label": "Amount", "datatype": None},
    {"name": "payer", "type": "compound", "label": "Payer", "description": "who pays"},
    {"name": "category", "type": "attribute", "label": "Category"},
    {"name": "time", "type": "date", "label": "Time"},
    {"name": "txdate", "type": "attribute", "datatype": "string", "label": "TxDate"},
]

META = dict(
    currency="EUR",
    territories=["de", "fr"],
    default_time="2013-01-01 00:00:00",
    label="FX 2013",
    description="fixture dataset",
)

ENTRIES = [
    {
        "id": "1",
        "amount": "100",
        "payer": {"html_url": "http://ex.org/p/1", "label": "Alice"},
        "category": "roads",
        "time": {"year": 2013, "month": 4, "day": 5},
        "txdate": "2013-04-05",
    },
    {
        "id": "2",
        "amount": "12.5",  # int-parse fallback → plain string literal
        "payer": {"html_url": "http://ex.org/p/2", "label": None},
        "category": "null",  # cleaned to missing
        "time": {"year": 2014, "month": None, "day": None},
        "txdate": "2013-04-05T06:07:08.00Z",
    },
    {
        "id": "3",
        "amount": None,
        "payer": {"html_url": None, "label": "NoUrl"},  # missing compound
        "category": "health",
        "time": {"year": None, "month": None, "day": None},
        "txdate": "2014-02-03T04:05:06.00+02:00",  # offset stripped
    },
    {
        "id": "4",
        "amount": "7",
        "payer": None,
        "category": "  ",  # blank → missing
        "time": None,
        "txdate": "garbage",  # parse error, not missing
    },
    {
        "id": "5",
        "amount": "0042",
        "payer": {"html_url": "http://ex.org/p/1", "label": "Alice"},  # dup entity
        "category": "edu",
        "time": {"year": 2013, "month": 12, "day": 31},
        "txdate": None,
    },
]

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("amount", T.StringType()),
        T.StructField(
            "payer",
            T.StructType(
                [
                    T.StructField("html_url", T.StringType()),
                    T.StructField("label", T.StringType()),
                ]
            ),
        ),
        T.StructField("category", T.StringType()),
        T.StructField(
            "time",
            T.StructType(
                [
                    T.StructField("year", T.IntegerType()),
                    T.StructField("month", T.IntegerType()),
                    T.StructField("day", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("txdate", T.StringType()),
    ]
)


def _convert(spark, entries=ENTRIES, mapping=MAPPING, meta=META, **kw):
    plan = compile_plan(
        "fx-2013",
        mapping,
        DatasetMeta(dataset="fx-2013", **meta),
        known_currencies={c for c, _ in currency_pairs()},
    )
    df = spark.createDataFrame(entries, ENTRY_SCHEMA)
    return convert_dataset(
        spark, df, plan, dict(currency_pairs()), dict(country_pairs()), **kw
    )


def test_dataset_triples_match_golden(spark):
    res = _convert(spark)
    actual = {(r["s"], r["p"], r["o"]) for r in res.triples.collect()}
    expected = golden_dataset_triples(
        "fx-2013", MAPPING, META, ENTRIES, dict(currency_pairs()), dict(country_pairs())
    )
    only_a = sorted(actual - expected)[:6]
    only_e = sorted(expected - actual)[:6]
    assert actual == expected, f"\nonly_actual={only_a}\nonly_expected={only_e}"


def test_amount_forced_to_measure():
    plan = compile_plan(
        "d",
        MAPPING,
        DatasetMeta(dataset="d", currency="EUR"),
        known_currencies={"EUR"},
    )
    comp = {c.name: c.ctype.value for c in plan.components}
    assert comp["amount"] == "measure"  # despite type=attribute in the mapping
    assert comp["txdate"] == "string_date"  # name heuristic
    assert comp["payer"] == "compound" and comp["time"] == "date"


def test_date_parse_error_counter(spark):
    res = _convert(spark)
    assert res.metrics["err_txdate"] == 1  # only "garbage"
    assert res.metrics["miss_txdate"] == 1  # only the None


def test_property_mapping_override():
    plan = compile_plan(
        "d",
        MAPPING,
        DatasetMeta(dataset="d", currency="EUR"),
        known_currencies={"EUR"},
        property_mapping={("d", "amount"): "http://ex.org/amount"},
    )
    by_name = {c.name: c.uri for c in plan.components}
    assert by_name["amount"] == "http://ex.org/amount"
    assert by_name["category"] == "http://linkedspending.aksw.org/ontology/d-category"


def test_reject_unknown_mapping_type():
    with pytest.raises(UnknownMappingTypeError):
        compile_plan(
            "d",
            [{"name": "x", "type": "mystery"}],
            DatasetMeta(dataset="d", currency="EUR"),
            known_currencies={"EUR"},
        )


def test_reject_no_measure():
    with pytest.raises(DatasetRejectedError, match="measure"):
        compile_plan(
            "d",
            [{"name": "cat", "type": "attribute"}, {"name": "t", "type": "date"}],
            DatasetMeta(dataset="d", currency="EUR"),
            known_currencies={"EUR"},
        )


def test_reject_unknown_currency():
    with pytest.raises(DatasetRejectedError, match="currency"):
        compile_plan(
            "d",
            MAPPING,
            DatasetMeta(dataset="d", currency="XXX"),
            known_currencies={"EUR"},
        )


def test_missing_stop_ratio(spark):
    # all-null entries: every component missing → ratio 1.0 ≥ stop_ratio
    entries = [
        {"id": str(i), "amount": None, "payer": None, "category": None, "time": None, "txdate": None}
        for i in range(10)
    ]
    with pytest.raises(DatasetRejectedError, match="missing"):
        _convert(spark, entries=entries, min_missing=5)
