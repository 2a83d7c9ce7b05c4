"""Stateful streaming operator (applyInPandasWithState) tests.

Two micro-batches of the same conversations must produce a running
state whose final snapshot equals the batch aggregate over all data —
i.e. incremental state == full recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark.functions import clean_string
from linkedspending_spark.streaming.state import stream_conversation_progress
from linkedspending_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts


def _write_two_batches(spark, tmp_path):
    pdf = synth_transcripts(n_convs=5, base_turns=6, seed=33)
    half = len(pdf) // 2
    in_path = tmp_path / "in"
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        spark.createDataFrame(part, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(in_path))
    return str(in_path), pdf


def test_stateful_progress_matches_batch(spark, tmp_path):
    in_path, _ = _write_two_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(in_path)
    )
    q = (
        stream_conversation_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one snapshot row per (conv, batch); the LAST
    # row per conv is the final state
    snap = spark.sql(
        """
        SELECT conv_id, n_turns, n_missing, max_turn_idx, completeness
        FROM (SELECT *, row_number() OVER (PARTITION BY conv_id
                                           ORDER BY n_turns DESC) rk
              FROM conv_state) WHERE rk = 1
        """
    )
    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(in_path)
    missing = (
        clean_string("tool").isNull().cast("int")
        + F.col("role").isNull().cast("int")
        + F.col("text").isNull().cast("int")
        + F.col("ts").isNull().cast("int")
    )
    want = batch.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(missing).cast("long").alias("n_missing"),
        F.max("turn_idx").cast("long").alias("max_turn_idx"),
    )
    got = {
        r["conv_id"]: (r["n_turns"], r["n_missing"], r["max_turn_idx"])
        for r in snap.collect()
    }
    expect = {
        r["conv_id"]: (r["n_turns"], r["n_missing"], r["max_turn_idx"])
        for r in want.collect()
    }
    assert got == expect
    # completeness consistent with counters
    for r in snap.collect():
        assert abs(
            r["completeness"] - (1.0 - r["n_missing"] / (r["n_turns"] * 4))
        ) < 1e-9
    # state actually accumulated across >1 micro-batch: some conv must
    # have an intermediate snapshot smaller than its final n_turns
    rows = spark.sql("SELECT conv_id, n_turns FROM conv_state").collect()
    per_conv = {}
    for r in rows:
        per_conv.setdefault(r["conv_id"], []).append(r["n_turns"])
    assert any(len(set(v)) > 1 for v in per_conv.values())
