"""Streaming triple sink: exactly-once landing with per-batch manifests."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark.operators.convert_transcripts import observation_triples
from linkedspending_spark.sources.manifest import ManifestStore
from linkedspending_spark.streaming.sink import stream_triples_to_table
from linkedspending_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts


def _write_batches(spark, tmp_path, n_files=3):
    pdf = synth_transcripts(n_convs=6, base_turns=4, seed=29)
    per = len(pdf) // n_files
    in_path = tmp_path / "in"
    for i in range(n_files):
        part = pdf.iloc[i * per : (i + 1) * per if i < n_files - 1 else len(pdf)]
        spark.createDataFrame(part, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(in_path))
    return str(in_path)


def test_stream_sink_lands_all_triples_with_manifests(spark, tmp_path):
    in_path = _write_batches(spark, tmp_path)
    out = str(tmp_path / "triples")
    man = str(tmp_path / "man")
    ckpt = str(tmp_path / "ckpt")
    stats = stream_triples_to_table(spark, in_path, out, man, ckpt)
    assert stats["batches"] >= 2 and stats["skipped"] == 0

    landed = {
        (r["s"], r["p"], r["o"]) for r in spark.read.parquet(out).collect()
    }
    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(in_path)
    want = {
        (r["s"], r["p"], r["o"]) for r in observation_triples(batch).collect()
    }
    assert landed == want
    # one manifest row per micro-batch, counts add up
    rows = ManifestStore(spark, man).read().collect()
    assert len(rows) == stats["batches"]
    assert sum(r["n_triples"] for r in rows) == len(want)
    # the streamed (batch, bucket) layout has its own reader that keeps
    # the batch partition column (read_triples would drop it)
    from linkedspending_spark.sources.io import read_streamed_triples

    streamed = read_streamed_triples(spark, out)
    assert "batch" in streamed.columns
    assert streamed.select("batch").distinct().count() == stats["batches"]
    assert {(r["s"], r["p"], r["o"]) for r in streamed.collect()} == want


def test_stream_sink_scans_manifest_once(spark, tmp_path, monkeypatch):
    """The seen-batch set is loaded once at stream start; per-batch work
    must not rescan the manifest table (was O(batches²))."""
    in_path = _write_batches(spark, tmp_path)
    calls = {"n": 0}
    orig = ManifestStore.read

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(ManifestStore, "read", counting)
    stats = stream_triples_to_table(
        spark,
        in_path,
        str(tmp_path / "triples"),
        str(tmp_path / "man"),
        str(tmp_path / "ckpt"),
    )
    assert stats["batches"] >= 2
    assert calls["n"] == 1  # independent of batch count


def test_stream_sink_crash_between_write_and_record_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """ADVICE fix: data committed but manifest record lost (crash window)
    must NOT duplicate triples on replay — the (batch, bucket) dynamic
    partition overwrite replaces the orphaned partitions."""
    import pyspark.errors

    in_path = _write_batches(spark, tmp_path)
    out = str(tmp_path / "triples")
    man = str(tmp_path / "man")

    orig = ManifestStore.record

    def crashing(self, *a, **k):
        raise RuntimeError("simulated crash after data commit")

    monkeypatch.setattr(ManifestStore, "record", crashing)
    import pytest as _pytest

    with _pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        stream_triples_to_table(spark, in_path, out, man, str(tmp_path / "c1"))
    orphaned = spark.read.parquet(out).count()
    assert orphaned > 0  # batch-0 data landed without a manifest row

    monkeypatch.setattr(ManifestStore, "record", orig)
    stats = stream_triples_to_table(spark, in_path, out, man, str(tmp_path / "c2"))
    assert stats["batches"] >= 2 and stats["skipped"] == 0

    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(in_path)
    want = observation_triples(batch).count()
    assert spark.read.parquet(out).count() == want  # no duplicates


def test_stream_sink_replay_is_skipped(spark, tmp_path):
    """Restarting from a FRESH checkpoint replays every file; manifest
    keys must suppress the duplicate appends (exactly-once)."""
    in_path = _write_batches(spark, tmp_path)
    out = str(tmp_path / "triples")
    man = str(tmp_path / "man")
    s1 = stream_triples_to_table(spark, in_path, out, man, str(tmp_path / "c1"))
    before = spark.read.parquet(out).count()
    # new checkpoint dir → Spark replays all files as fresh batch ids 0..n;
    # same batching (maxFilesPerTrigger=1) → same batch-{id} keys → skipped
    s2 = stream_triples_to_table(spark, in_path, out, man, str(tmp_path / "c2"))
    assert s2["batches"] == 0 and s2["skipped"] == s1["batches"]
    assert spark.read.parquet(out).count() == before
