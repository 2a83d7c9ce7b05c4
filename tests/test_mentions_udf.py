"""Arrow pandas-UDF mention detection / link scoring / language ID."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark.operators.convert_transcripts import mention_triples
from linkedspending_spark.operators.mentions import (
    make_language_id,
    make_link_scorer,
    make_mention_detector,
    mention_triples_pandas,
)
from linkedspending_spark.sources.dictionaries import (
    country_df,
    country_pairs,
    currency_df,
    currency_pairs,
)
from linkedspending_spark.transcripts import synth_transcripts_df


def test_udf_mentions_match_native_currency(spark):
    """The Arrow-UDF path reproduces the native broadcast-join path."""
    t = synth_transcripts_df(spark, n_convs=8, base_turns=5, seed=5)
    native = mention_triples(t, currency_df(spark), country_df(spark))
    native_cur = {
        (r["s"], r["o"])
        for r in native.where(F.col("p").contains("currency")).collect()
    }
    udf_cur = {
        (r["s"], r["o"])
        for r in mention_triples_pandas(
            spark, t, dict(currency_pairs()), "http://dbpedia.org/ontology/currency"
        ).collect()
    }
    assert udf_cur == native_cur and len(udf_cur) > 0


def test_mention_detector_multiword(spark):
    detect = make_mention_detector(
        spark, {"United States": "http://x/US", "EUR": "http://x/EUR"}
    )
    df = spark.createDataFrame(
        [("paid 5 EUR in the United States",), ("EURx is not a mention",), (None,)],
        "text string",
    )
    got = [r["m"] for r in df.select(detect("text").alias("m")).collect()]
    assert got[0] == ["http://x/EUR", "http://x/US"]
    assert got[1] == []  # boundary guard: EURx must not match
    assert got[2] == []


def test_link_scorer_limes_thresholds(spark):
    """Trigram accept≥0.8 semantics (limes/dbpedia_country_source.xml:60-70)."""
    scorer = make_link_scorer(
        spark, {"japan": "http://dbp/Japan", "germany": "http://dbp/Germany"}, 0.8
    )
    df = spark.createDataFrame(
        [("japan",), ("japa",), ("xyzzy",)], "label string"
    )
    rows = df.select(scorer("label").alias("r")).collect()
    assert rows[0]["r"]["uri"] == "http://dbp/Japan" and rows[0]["r"]["sim"] == 1.0
    assert rows[1]["r"]["uri"] is None  # 'japa' trigram-jaccard 2/3 < 0.8
    assert rows[2]["r"]["uri"] is None


def test_language_id(spark):
    lang = make_language_id(spark)
    df = spark.createDataFrame(
        [
            ("the cat is on the mat and it is happy",),
            ("der hund ist mit dem ball und das ist gut",),
            ("le chat est pour la maison avec un ami",),
            ("zzz qqq",),
        ],
        "text string",
    )
    got = [r["l"] for r in df.select(lang("text").alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]
