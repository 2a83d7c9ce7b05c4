"""Streaming incremental canonicalization: fold sameAs waves into a store.

The batch pipeline canonicalizes with a full connected-components pass
(``operators/canon.py``); a deployment that keeps converting new
transcripts produces a steady trickle of new ``owl:sameAs`` edges
(dictionary links, LSH links, property aliases). Recomputing CC over
10^12 nodes per wave is absurd — this sink folds each micro-batch of
edges into a persistent ``(node, component)`` assignment store with
:func:`~linkedspending_spark.operators.canon.merge_components`:
O(wave) CC work plus one scan of the store per batch, never a shuffle
of the store.

Exactly-once, same construction as ``sink.py``:

* the store is **versioned by batch id** (``{store}/v=<batch_id>``) and
  each version is written with ``mode("overwrite")`` — a replayed
  micro-batch (restart from the streaming checkpoint, or a crash
  between the data commit and the manifest record) rebuilds ITS OWN
  version directory from the last *committed* version, so replays are
  idempotent rather than compounding;
* the manifest row (``canon-batch-<id>``, carrying the version pointer
  in ``n_rows``) is recorded AFTER the data commit; the latest
  committed version is resolved ONCE at stream start and then tracked
  driver-side — a batch whose key is already present is skipped.

Per-batch cost: CC over O(wave) rows, plus one scan and one rewrite of
the store (the versioned-parquet sandbox stand-in has no MERGE). On a
table format with row-level merge (Iceberg/Delta),
``merge_components(..., changed_only=True)`` returns exactly the upsert
set, making the store maintenance O(affected) too — the versioning and
manifest protocol here stay the same.

Reference analog: the createlinks/Upload loop re-derives links per
dataset as datasets arrive (SURVEY.md §2 J6); this is that loop's
10^12-scale shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.canon import merge_components
from ..sources.manifest import ManifestStore, new_run_id

EDGE_SCHEMA = "src string, dst string"
_KEY_PREFIX = "canon-batch-"

ASSIGNMENT_SCHEMA = "node string, component string"


def read_assignments(
    spark: SparkSession, store_path: str, manifest_path: str
) -> DataFrame:
    """The latest committed assignment map (empty DataFrame if none).

    The manifest is authoritative (same rule as bucket counts,
    serve.py): a version directory without its manifest row is an
    uncommitted replay remnant and is never read.
    """
    version = _latest_version(ManifestStore(spark, manifest_path))
    if version is None:
        return spark.createDataFrame([], ASSIGNMENT_SCHEMA)
    return spark.read.schema(ASSIGNMENT_SCHEMA).parquet(
        f"{store_path}/v={version}"
    )


def _latest_version(store: ManifestStore) -> int | None:
    row = (
        store.read()
        .where(F.col("dataset").startswith(_KEY_PREFIX))
        .agg(F.max("n_rows").alias("v"))
        .collect()[0]
    )
    return None if row["v"] is None else int(row["v"])


def stream_sameas_merge(
    spark: SparkSession,
    in_path: str,
    store_path: str,
    manifest_path: str,
    checkpoint_path: str,
    max_files: int = 1,
) -> dict:
    """Drive the edge stream to completion, folding waves into the store.

    ``in_path``: directory of parquet edge files (``src``, ``dst``).
    Returns ``{"batches": n, "skipped": n, "version": latest}``.
    Synchronous (tests/backfill); a deployment would ``.start()`` and
    let it run.
    """
    store = ManifestStore(spark, manifest_path)
    run_id = new_run_id()
    seen = {
        r["dataset"]
        for r in store.read()
        .where(F.col("dataset").startswith(_KEY_PREFIX))
        .select("dataset")
        .distinct()
        .collect()
    }
    state = {"version": _latest_version(store)}
    stats = {"batches": 0, "skipped": 0}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        key = f"{_KEY_PREFIX}{batch_id}"
        if key in seen:
            stats["skipped"] += 1
            return
        if state["version"] is None:
            current = spark.createDataFrame([], ASSIGNMENT_SCHEMA)
        else:
            current = spark.read.schema(ASSIGNMENT_SCHEMA).parquet(
                f"{store_path}/v={state['version']}"
            )
        merged = merge_components(current, batch_df)
        # idempotent by construction: overwrite THIS batch's version dir
        merged.write.mode("overwrite").parquet(f"{store_path}/v={batch_id}")
        store.record(
            dataset=key,
            n_rows=int(batch_id),  # the version pointer
            n_triples=None,
            run_id=run_id,
        )
        seen.add(key)
        state["version"] = int(batch_id)
        stats["batches"] += 1

    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_path)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {**stats, "version": state["version"]}
