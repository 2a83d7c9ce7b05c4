"""Incremental transcript ingestion via Structured Streaming.

The reference is batch-only — its "streaming" is a 1-minute scheduler
re-running batch jobs (Rest.java:87-91; SURVEY.md §2.9). This module is
the Spark-native upgrade of that loop: a `readStream` over arriving
transcript files, per-turn observation-triple emission (the same narrow
projection as the batch path — stateless, so it runs unchanged under
streaming), and windowed per-conversation progress aggregates with a
watermark for late turns.

Dataset-level completeness/refYear triples need full-conversation state,
so they remain batch jobs over the landed data (the skip/resume
manifests make those incremental) — the classic lambda split, chosen
deliberately: per-turn triples are append-only facts, per-dataset
triples are replaceable summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.convert_transcripts import observation_triples
from ..transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """File-arrival stream of transcript parquet (one micro-batch per files)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_observation_triples(transcripts: DataFrame) -> DataFrame:
    """Per-turn triples on a stream — stateless, reuses the batch operator."""
    return observation_triples(transcripts)


def stream_turn_rate(transcripts: DataFrame, window: str = "10 minutes",
                     watermark: str = "30 minutes") -> DataFrame:
    """Windowed turns-per-conversation with late-data watermark."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "conv_id",
            "n_turns",
        )
    )


def stream_dedup_turns(
    transcripts: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Exactly-once turn stream under at-least-once delivery.

    Upstream transports (file re-drops, Kafka replays) deliver the same
    turn twice; ``dropDuplicatesWithinWatermark`` keys state on
    (conv_id, turn_idx) and expires it with the event-time watermark —
    bounded state (the batch U3 statement-set semantic, streaming
    edition). A duplicate arriving within the watermark horizon is
    suppressed; state for conversations older than the horizon is
    dropped, so state size tracks the ACTIVE window, not history.
    """
    return transcripts.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def run_stream_to_memory(
    spark: SparkSession, in_path: str, query_name: str = "triples_stream"
) -> int:
    """Drive the stream synchronously (tests): returns rows materialized."""
    stream = read_transcript_stream(spark, in_path)
    triples = stream_observation_triples(stream)
    q = (
        triples.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT count(*) AS n FROM {query_name}").collect()[0]["n"]
