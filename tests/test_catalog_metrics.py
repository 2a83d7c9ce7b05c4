"""Catalog (S1/S5), scheduling pool (Boss J4+U2), metrics store (A5)."""

from __future__ import annotations

from linkedspending_spark.jobs import run_transcripts_job
from linkedspending_spark.sources.catalog import (
    cached_catalog_rows,
    dataset_catalog,
    input_files,
    invalidate_catalog_cache,
    scheduling_pool,
)
from linkedspending_spark.sources.manifest import ManifestStore
from linkedspending_spark.sources.metrics import MetricsStore
from linkedspending_spark.transcripts import synth_transcripts_df


def test_dataset_catalog_and_cache(spark):
    t = synth_transcripts_df(spark, n_convs=5, base_turns=4, seed=14)
    cat = dataset_catalog(t).collect()
    assert [r["conv_id"] for r in cat] == sorted(r["conv_id"] for r in cat)
    assert all(r["created"] <= r["modified"] and r["n_turns"] >= 4 for r in cat)
    invalidate_catalog_cache()
    rows1 = cached_catalog_rows(t, "k1")
    rows2 = cached_catalog_rows(t, "k1")  # TTL hit: same object
    assert rows1 is rows2 and len(rows1) == 5


def test_input_files(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=3, base_turns=3, seed=15)
    p = str(tmp_path / "in")
    t.repartition(3).write.parquet(p)
    files = [r["file"] for r in input_files(spark.read.parquet(p)).collect()]
    assert len(files) >= 2 and all("in" in f for f in files)


def test_scheduling_pool(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=6, base_turns=4, seed=16)
    cat = dataset_catalog(t)
    man = ManifestStore(spark, str(tmp_path / "man"))
    # two datasets converted (fresh), rest unconverted
    for name in ["conv-0000", "conv-0001"]:
        man.record(name, 10, 100, "r1")
    pool = {r["dataset"] for r in scheduling_pool(cat, man.read()).collect()}
    assert pool == {f"conv-{i:04d}" for i in range(2, 6)}
    # stale_before in the future → converted ones become stale again
    import time

    pool2 = {
        r["dataset"]
        for r in scheduling_pool(cat, man.read(), stale_before=time.time() + 10).collect()
    }
    assert pool2 == {f"conv-{i:04d}" for i in range(6)}


def test_metrics_recorded_by_job(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=6, base_turns=4, seed=17)
    run_transcripts_job(
        spark,
        t,
        str(tmp_path / "out"),
        str(tmp_path / "man"),
        n_buckets=4,
        metrics_path=str(tmp_path / "metrics"),
    )
    m = MetricsStore(spark, str(tmp_path / "metrics")).read().collect()
    keys = {r["key"]: r["value"] for r in m if r["stage"] == "convert"}
    assert keys["buckets_converted"] >= 1
    assert keys["triples"] > 0 and keys["seconds"] > 0
    # stage metrics plus the round-5 lifecycle history rows
    assert {r["stage"] for r in m} == {"convert", "history"}
