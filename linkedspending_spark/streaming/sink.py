"""Streaming triple sink with per-batch manifests (exactly-once).

``foreachBatch`` materialization of the per-turn triple stream into the
same partitioned layout as the batch pipeline, plus one manifest row
per micro-batch. Exactly-once despite parquet append: the manifest is
keyed by ``batch-{id}`` and a replayed micro-batch (restart from the
streaming checkpoint) is skipped when its manifest row already exists —
the foreachBatch idempotence pattern, and the streaming twin of the
batch job's write-then-record ordering (UploadWorker.java:32-59
semantics; sources/manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..jobs import bucket_of
from ..model import TRANSFORMATION_VERSION
from ..operators.convert_transcripts import observation_triples
from ..sources.manifest import ManifestStore, new_run_id
from ..transcripts import TRANSCRIPT_SCHEMA


def stream_triples_to_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    manifest_path: str,
    checkpoint_path: str,
    n_buckets: int = 16,
    max_files: int = 1,
) -> dict:
    """Drive the file stream to completion, landing triples + manifests.

    Returns {"batches": n, "skipped": n}. Synchronous (tests/backfill);
    a deployment would `.start()` without processAllAvailable and let it
    run. Batch data is appended bucket-partitioned; a replayed batch id
    is detected via its manifest row and skipped entirely.
    """
    store = ManifestStore(spark, manifest_path)
    run_id = new_run_id()
    stats = {"batches": 0, "skipped": 0}

    def land(batch_df: DataFrame, batch_id: int) -> None:
        key = f"batch-{batch_id}"
        already = store.read().where(F.col("dataset") == key).count()
        if already:
            stats["skipped"] += 1
            return
        triples = observation_triples(batch_df).withColumn(
            "bucket", bucket_of(F.col("dataset"), n_buckets)
        )
        (
            triples.repartition(F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(out_path)
        )
        n = triples.count()
        store.record(
            dataset=key,
            n_rows=batch_df.count(),
            n_triples=n,
            run_id=run_id,
            version=TRANSFORMATION_VERSION,
        )
        stats["batches"] += 1

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_path)
    )
    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stats
