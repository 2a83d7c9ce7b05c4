"""Dataset (named-graph) deletion — the Virtuoso.java:39-49
``DROP SILENT GRAPH`` / DeleteAllSubGraphs.java analog: tombstone the
manifest FIRST (log-structured latest-row-wins), then unlink the
partition directories. O(partitions) metadata work, never a rewrite."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from linkedspending_spark.operators.convert_transcripts import (
    convert_transcripts,
)
from linkedspending_spark.sources.io import (
    delete_all_datasets,
    delete_datasets,
    list_dataset_partitions,
    read_triples,
    write_triples,
)
from linkedspending_spark.sources.manifest import (
    TOMBSTONE_VERSION,
    ManifestStore,
    new_run_id,
)
from linkedspending_spark.transcripts import synth_transcripts_df


def _landed(spark, tmp_path):
    out = str(tmp_path / "triples")
    man = str(tmp_path / "manifests")
    t = synth_transcripts_df(spark, n_convs=4, base_turns=4)
    triples = convert_transcripts(spark, t)
    write_triples(triples, out)
    store = ManifestStore(spark, man)
    names = list_dataset_partitions(out)
    store.record_many([(n, 1, 1) for n in names], new_run_id())
    return out, man, store, names


def test_delete_one_dataset(spark, tmp_path):
    out, man, store, names = _landed(spark, tmp_path)
    assert len(names) == 4
    victim = names[0]

    removed = delete_datasets(out, [victim], manifest_path=man, spark=spark)
    assert removed == 1
    # partition directory gone; raw readers lose the graph
    assert victim not in list_dataset_partitions(out)
    left = {
        r["dataset"]
        for r in read_triples(spark, out).select("dataset").distinct().collect()
    }
    assert left == set(names[1:])
    # manifest: no longer completed, re-exposed to pending
    done = {r["dataset"] for r in store.completed().collect()}
    assert victim not in done and set(names[1:]) == done
    work = spark.createDataFrame([(n,) for n in names], "dataset string")
    pend = {r["dataset"] for r in store.pending(work).collect()}
    assert pend == {victim}

    # SILENT semantics: deleting again removes nothing, raises nothing
    assert delete_datasets(out, [victim]) == 0


def test_tombstone_first_crash_window(spark, tmp_path):
    """A crash between tombstone and unlink leaves data visible but the
    dataset NOT completed — re-convert or re-delete, never 'manifest
    says converted but data gone'."""
    out, man, store, names = _landed(spark, tmp_path)
    victim = names[1]

    store.tombstone([victim], new_run_id())  # crash before the unlink
    assert victim in list_dataset_partitions(out)  # data still there
    done = {r["dataset"] for r in store.completed().collect()}
    assert victim not in done
    rows = store.read().where(F.col("dataset") == victim).collect()
    assert TOMBSTONE_VERSION in {r["version"] for r in rows}

    # re-running the delete finishes the job idempotently
    assert delete_datasets(out, [victim], manifest_path=man, spark=spark) == 1
    assert victim not in list_dataset_partitions(out)


def test_reconvert_after_delete(spark, tmp_path):
    """Latest-row-wins: completion → tombstone → completion again ends
    COMPLETED (the log-structured read the Iceberg table would give)."""
    out, man, store, names = _landed(spark, tmp_path)
    victim = names[2]
    delete_datasets(out, [victim], manifest_path=man, spark=spark)
    assert victim not in {r["dataset"] for r in store.completed().collect()}
    store.record(victim, 1, 1, new_run_id())  # re-converted
    assert victim in {r["dataset"] for r in store.completed().collect()}


def test_delete_all(spark, tmp_path):
    out, man, store, names = _landed(spark, tmp_path)
    assert delete_all_datasets(out, manifest_path=man, spark=spark) == 4
    assert list_dataset_partitions(out) == []
    assert store.completed().count() == 0
    # idempotent over the now-empty table
    assert delete_all_datasets(out) == 0
    assert os.path.isdir(out)  # the table root survives
