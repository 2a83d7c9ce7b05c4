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


def _bucketed(spark, tmp_path, n_buckets=4):
    from linkedspending_spark.jobs import bucket_of

    out = str(tmp_path / "bucketed")
    t = synth_transcripts_df(spark, n_convs=10, base_turns=4)
    triples = convert_transcripts(spark, t).withColumn(
        "bucket", bucket_of(F.col("dataset"), n_buckets)
    )
    write_triples(triples, out, partition_col="bucket")
    table = spark.read.parquet(out)
    counts = {
        r["dataset"]: r["n"]
        for r in table.groupBy("dataset").agg(F.count("*").alias("n")).collect()
    }
    return out, counts


def test_delete_bucketed_copy_on_write(spark, tmp_path):
    """Dataset delete from the bucket-partitioned landed table: only
    the affected bucket partitions rewrite; co-bucketed datasets keep
    every row."""
    from linkedspending_spark.sources.io import delete_datasets_bucketed

    out, counts = _bucketed(spark, tmp_path)
    names = sorted(counts)
    victims = names[:2]
    before_total = sum(counts.values())

    rep = delete_datasets_bucketed(spark, out, victims, n_buckets=4)
    assert rep["rows_deleted"] == sum(counts[v] for v in victims)
    assert 1 <= rep["buckets_rewritten"] <= 2

    after = {
        r["dataset"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("dataset")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(after) == set(names[2:])
    for n in names[2:]:
        assert after[n] == counts[n]  # co-bucketed rows all intact
    assert sum(after.values()) == before_total - rep["rows_deleted"]

    # idempotent: deleting the same victims again touches nothing
    rep2 = delete_datasets_bucketed(spark, out, victims, n_buckets=4)
    assert rep2["rows_deleted"] == 0


def test_delete_bucketed_empties_a_bucket(spark, tmp_path):
    """Deleting every dataset of a bucket drops the partition dir
    entirely (dynamic overwrite writes nothing for it) and the table
    still reads."""
    from linkedspending_spark.jobs import bucket_of
    from linkedspending_spark.sources.io import delete_datasets_bucketed

    out, counts = _bucketed(spark, tmp_path)
    # find one bucket's full dataset membership
    b_of = {
        r["dataset"]: r["b"]
        for r in spark.sql(
            "SELECT dataset, cast(pmod(xxhash64(dataset), 4) as int) b "
            "FROM (VALUES "
            + ", ".join(f"('{n}')" for n in counts)
            + ") AS t(dataset)"
        ).collect()
    }
    target_b = next(iter(b_of.values()))
    victims = [n for n, b in b_of.items() if b == target_b]

    delete_datasets_bucketed(spark, out, victims, n_buckets=4)
    assert not os.path.isdir(os.path.join(out, f"bucket={target_b}"))
    survivors = {
        r["dataset"]
        for r in spark.read.parquet(out).select("dataset").distinct().collect()
    }
    assert survivors == set(counts) - set(victims)


def test_delete_bucketed_crash_rollback(spark, tmp_path):
    """A half-completed swap (live renamed to trash, staged not yet
    moved in) rolls back on the next entry — co-bucketed rows are
    recovered, and the interrupted delete completes."""
    from linkedspending_spark.sources.io import delete_datasets_bucketed

    out, counts = _bucketed(spark, tmp_path)
    names = sorted(counts)
    victim = names[0]
    # simulate the crash window: some bucket's live dir moved to trash
    lives = [d for d in os.listdir(out) if d.startswith("bucket=")]
    crashed = lives[0]
    b = crashed[len("bucket="):]
    os.rename(
        os.path.join(out, crashed), os.path.join(out, f"_old_{b}")
    )
    # trash dirs are invisible to partition discovery (no read errors),
    # the crashed bucket's rows are simply absent until rollback
    spark.read.parquet(out).count()

    rep = delete_datasets_bucketed(spark, out, [victim], n_buckets=4)
    assert rep["rows_deleted"] == counts[victim]
    after = {
        r["dataset"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("dataset")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every non-victim row — including the crashed bucket's — is back
    assert after == {n: counts[n] for n in names[1:]}
    assert not any(d.startswith("_old_") for d in os.listdir(out))


def test_delete_all_bucketed_uncompletes_work_units(spark, tmp_path):
    """delete_all over the LANDED bucket layout: every bucket dir
    unlinks and the manifest's own work-unit keys (bucket ids)
    tombstone — a future convert re-lists every bucket as pending —
    while config sentinels ("__n_buckets__") survive (jobs.py reads
    their n_rows directly; int(None) would crash the resume guard)."""
    out, counts = _bucketed(spark, tmp_path)
    man = str(tmp_path / "man_bucketed")
    store = ManifestStore(spark, man)
    # the transcripts job's manifest shape: bucket ids + the sentinel
    store.record_many(
        [(str(b), None, 10) for b in range(4)] + [("__n_buckets__", 4, None)],
        new_run_id(),
    )
    n_dirs = len([d for d in os.listdir(out) if d.startswith("bucket=")])
    removed = delete_all_datasets(out, manifest_path=man, spark=spark)
    assert removed == n_dirs and n_dirs > 0
    assert os.path.isdir(out)
    assert not any(d.startswith("bucket=") for d in os.listdir(out))
    done = {r["dataset"] for r in store.completed().collect()}
    assert done == {"__n_buckets__"}
