"""Streaming incremental canonicalization: per-wave merge into a
versioned assignment store, exactly-once."""

from __future__ import annotations

from linkedspending_spark.operators.canon import connected_components
from linkedspending_spark.sources.manifest import ManifestStore
from linkedspending_spark.streaming.canon import (
    EDGE_SCHEMA,
    read_assignments,
    stream_sameas_merge,
)

WAVES = [
    [("a", "b"), ("c", "d")],
    [("b", "c"), ("x", "y")],          # bridges a-b and c-d; new comp x-y
    [("new-1", "y"), ("new-1", "new-2")],  # attaches fresh nodes
]


def _write_waves(spark, tmp_path, waves):
    in_path = tmp_path / "edges"
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, EDGE_SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(in_path))
    return str(in_path)


def test_stream_merge_matches_full_cc(spark, tmp_path):
    in_path = _write_waves(spark, tmp_path, WAVES)
    store = str(tmp_path / "store")
    man = str(tmp_path / "man")
    ckpt = str(tmp_path / "ckpt")
    stats = stream_sameas_merge(spark, in_path, store, man, ckpt)
    assert stats["batches"] >= 2 and stats["skipped"] == 0

    got = {
        r["node"]: r["component"]
        for r in read_assignments(spark, store, man).collect()
    }
    all_edges = [e for w in WAVES for e in w]
    want = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(all_edges, "src string, dst string")
        ).collect()
    }
    assert got == want
    # manifest keys carry the version pointer (canon-batch-v<k>-<hash>);
    # n_rows holds the store's real row count, not a smuggled pointer
    rows = ManifestStore(spark, man).read().collect()
    assert len(rows) == stats["batches"]
    versions = [int(r["dataset"].split("-")[2][1:]) for r in rows]
    assert stats["version"] == max(versions)
    latest = max(rows, key=lambda r: int(r["dataset"].split("-")[2][1:]))
    assert int(latest["n_rows"]) == len(got)


def test_stream_merge_restart_skips_committed_batches(spark, tmp_path):
    """Re-running the finished stream (same checkpoint) replays nothing;
    a NEW wave appended afterwards folds on top of the committed store."""
    in_path = _write_waves(spark, tmp_path, WAVES[:2])
    store = str(tmp_path / "store")
    man = str(tmp_path / "man")
    ckpt = str(tmp_path / "ckpt")
    first = stream_sameas_merge(spark, in_path, store, man, ckpt)
    assert first["batches"] >= 1

    # finished stream, same checkpoint: no new batches, nothing skipped
    # (the streaming engine itself doesn't replay committed offsets)
    again = stream_sameas_merge(spark, in_path, store, man, ckpt)
    assert again["batches"] == 0
    assert again["version"] == first["version"]

    # append wave 3 and resume: exactly the increment is processed
    spark.createDataFrame(WAVES[2], EDGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    resumed = stream_sameas_merge(spark, in_path, store, man, ckpt)
    assert resumed["batches"] >= 1
    got = {
        r["node"]: r["component"]
        for r in read_assignments(spark, store, man).collect()
    }
    all_edges = [e for w in WAVES for e in w]
    want = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(all_edges, "src string, dst string")
        ).collect()
    }
    assert got == want


def test_stream_merge_replayed_batch_is_idempotent(spark, tmp_path):
    """A batch whose CONTENT hash is committed is skipped outright (the
    crash-between-commit-and-record case rebuilds the next uncommitted
    version dir, so either way the store never double-applies a wave)."""
    in_path = _write_waves(spark, tmp_path, WAVES[:1])
    store = str(tmp_path / "store")
    man = str(tmp_path / "man")
    first = stream_sameas_merge(
        spark, in_path, store, man, str(tmp_path / "ckpt1")
    )
    assert first["batches"] == 1
    # fresh checkpoint: the engine replays the same file as batch 0;
    # its content hash is already committed, so the fold is skipped
    second = stream_sameas_merge(
        spark, in_path, store, man, str(tmp_path / "ckpt2")
    )
    assert second["batches"] == 0 and second["skipped"] >= 1
    got = {
        r["node"]: r["component"]
        for r in read_assignments(spark, store, man).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_stream_merge_fresh_checkpoint_grown_input_applies_new_waves(
    spark, tmp_path
):
    """Round-3 ADVICE regression: with a FRESH checkpoint against an
    existing manifest, micro-batch numbering restarts at 0 — under
    batch-id keying a batch holding NEW files collided with an
    already-seen key and its sameAs wave was silently dropped. Content
    keying must apply the new waves and skip only the true replays."""
    in_path = _write_waves(spark, tmp_path, WAVES[:1])
    store = str(tmp_path / "store")
    man = str(tmp_path / "man")
    first = stream_sameas_merge(
        spark, in_path, store, man, str(tmp_path / "ckpt1")
    )
    assert first["batches"] == 1

    # the input dir GROWS, then the stream restarts from a FRESH
    # checkpoint: batch ids restart at 0 over a longer file list
    for wave in WAVES[1:]:
        spark.createDataFrame(wave, EDGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_path)
    second = stream_sameas_merge(
        spark, in_path, store, man, str(tmp_path / "ckpt2")
    )
    assert second["batches"] >= 1  # new waves APPLIED, not dropped
    assert second["skipped"] >= 1  # the true replay skipped

    got = {
        r["node"]: r["component"]
        for r in read_assignments(spark, store, man).collect()
    }
    all_edges = [e for w in WAVES for e in w]
    want = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(all_edges, "src string, dst string")
        ).collect()
    }
    assert got == want


def test_stream_merge_uncommitted_version_is_ignored_and_rebuilt(spark, tmp_path):
    """Crash between the version-dir write and the manifest record: the
    orphan version dir is never read (manifest is authoritative) and a
    restarted stream rebuilds that exact version idempotently."""
    import pathlib

    in_path = _write_waves(spark, tmp_path, WAVES[:1])
    store = str(tmp_path / "store")
    man = str(tmp_path / "man")
    first = stream_sameas_merge(
        spark, in_path, store, man, str(tmp_path / "ckpt1")
    )
    committed = first["version"]

    # simulate the crash remnant: a deeper version dir with bogus data
    # and NO manifest row
    orphan = committed + 7
    spark.createDataFrame(
        [("poison", "poison")], "node string, component string"
    ).write.parquet(f"{store}/v={orphan}")

    # reads resolve through the manifest -> the orphan is invisible
    got = {
        r["node"]: r["component"]
        for r in read_assignments(spark, store, man).collect()
    }
    assert "poison" not in got
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}

    # a resumed stream folds new waves from the last COMMITTED version,
    # not the orphan
    spark.createDataFrame(WAVES[1], EDGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    stream_sameas_merge(spark, in_path, store, man, str(tmp_path / "ckpt1"))
    got2 = {
        r["node"]: r["component"]
        for r in read_assignments(spark, store, man).collect()
    }
    all_edges = [e for w in WAVES[:2] for e in w]
    want = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(all_edges, "src string, dst string")
        ).collect()
    }
    assert got2 == want and "poison" not in got2
    # the orphan dir still exists on disk but stays unreachable
    assert pathlib.Path(f"{store}/v={orphan}").exists()


def test_legacy_batch_keys_refused(spark, tmp_path):
    import pytest
    """A manifest written in the pre-content-key format (bare
    'canon-batch-<id>' rows) must make the stream REFUSE to start —
    silently restarting at v0 would overwrite the committed assignment
    map with a merge into an empty base."""
    from linkedspending_spark.sources.manifest import ManifestStore
    from linkedspending_spark.streaming.canon import read_assignments

    mpath = str(tmp_path / "manifests")
    store = ManifestStore(spark, mpath)
    store.record("canon-batch-0", 3, None, run_id="old-format")
    with pytest.raises(ValueError, match="legacy canon-batch"):
        read_assignments(spark, str(tmp_path / "store"), mpath)
