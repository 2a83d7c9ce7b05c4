"""Salted repartition / two-phase aggregation correctness under skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark.operators.skew import (
    salted_agg,
    salted_count,
    salted_repartition,
)
from linkedspending_spark.transcripts import synth_transcripts_df


def test_salted_count_equals_plain(spark):
    t = synth_transcripts_df(spark, n_convs=6, base_turns=5, mega_conv_turns=400, seed=2)
    plain = {r["conv_id"]: r["n"] for r in t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["conv_id"]: r["n"] for r in salted_count(t, "conv_id").collect()}
    assert salted == plain
    assert plain["conv-mega"] == 400


def test_salted_agg_sum_avg(spark):
    t = synth_transcripts_df(spark, n_convs=4, base_turns=6, mega_conv_turns=300, seed=8)
    got = {
        r["conv_id"]: (r["total"], r["n"])
        for r in salted_agg(
            t,
            "conv_id",
            partial_aggs=[
                F.sum("turn_idx").alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            ],
            final_aggs=lambda: [
                F.sum("__s").cast("long").alias("total"),
                F.sum("__n").cast("long").alias("n"),
            ],
        ).collect()
    }
    want = {
        r["conv_id"]: (r["total"], r["n"])
        for r in t.groupBy("conv_id")
        .agg(F.sum("turn_idx").cast("long").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_salted_repartition_spreads_hot_key(spark):
    t = synth_transcripts_df(spark, n_convs=2, base_turns=3, mega_conv_turns=500, seed=1)
    rep = salted_repartition(t, "conv_id", n_salts=8, partitions=8)
    sizes = (
        rep.withColumn("pid", F.spark_partition_id())
        .where(F.col("conv_id") == "conv-mega")
        .groupBy("pid")
        .count()
        .collect()
    )
    # the hot key must span multiple partitions (plain hash → exactly 1)
    assert len(sizes) >= 4, sizes
    assert rep.count() == t.count()
