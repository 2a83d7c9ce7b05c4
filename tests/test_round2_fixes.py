"""Round-2 fix gates: LSH-blocked fuzzy linking at 10⁴ candidates,
reliable CC checkpointing, import-job bucket sentinel, and the
monotonic (clock-tie-proof) canonicalize freshness rule."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from linkedspending_spark.jobs import (
    BUCKETS_SENTINEL,
    run_canonicalize_job,
    run_import_nt_job,
    run_transcripts_job,
)
from linkedspending_spark.sources.manifest import ManifestStore
from linkedspending_spark.transcripts import synth_transcripts_df


def test_fuzzy_link_best_bounded_at_1e4_candidates(spark):
    """The scale path scores only LSH-bucket collisions: 200 labels ×
    10,000 candidates completes in bounded time (the pandas scorer's
    O(labels × candidates) loop is the anti-pattern this replaces) and
    recovers planted exact matches."""
    from linkedspending_spark.operators.mentions import fuzzy_link_best

    # candidates: 10k synthetic entity names; 200 of them are the labels
    cands = spark.range(10_000).select(
        F.concat(F.lit("uri:"), F.col("id").cast("string")).alias("uri"),
        F.concat(
            F.lit("entity name number "), F.col("id").cast("string")
        ).alias("clabel"),
    )
    labels = spark.range(200).select(
        F.concat(F.lit("lbl-"), F.col("id").cast("string")).alias("label_key"),
        F.concat(
            F.lit("entity name number "), (F.col("id") * 50).cast("string")
        ).alias("label"),
    )
    best = fuzzy_link_best(labels, cands, threshold=0.5).collect()
    by_label = {r["label_key"]: r for r in best}
    # planted exact matches must win with sim 1.0
    for i in (0, 1, 100, 199):
        r = by_label[f"lbl-{i}"]
        assert r["uri"] == f"uri:{i * 50}" and r["sim"] == 1.0
    # one row per matched label (best-per-label contract)
    assert len(best) == len(by_label)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir set, the CC loop uses reliable (dir-backed)
    checkpoints — executor loss cannot strand truncated lineage."""
    from linkedspending_spark.operators.canon import connected_components

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r")],
            "src string, dst string",
        )
        comp = {
            r["node"]: r["component"]
            # local_threshold=0: this test is about the DISTRIBUTED
            # loop's checkpoint behavior, so force past the small-graph
            # driver fast path
            for r in connected_components(edges, local_threshold=0).collect()
        }
        assert comp == {
            "a": "a", "b": "a", "c": "a",
            "x": "x", "y": "x",
            "p": "p", "q": "p", "r": "p",
        }
        # reliable checkpoint files actually landed in the dir
        found = []
        for root, _dirs, files in os.walk(ckpt):
            found += [os.path.join(root, f) for f in files]
        assert found, "no reliable checkpoint files written"
    finally:
        # later tests fall back to localCheckpoint if dir removed; Spark
        # has no unset API — point it at a durable tmp instead
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt_rest"))


def test_import_job_writes_buckets_sentinel(spark, tmp_path):
    """ADVICE fix: the NT-import path must record the __n_buckets__
    sentinel so a later transcripts run with a different bucket count is
    rejected instead of silently resuming against wrong buckets."""
    from linkedspending_spark.operators.convert_transcripts import (
        observation_triples,
    )
    from linkedspending_spark.sources.io import write_nt

    t = synth_transcripts_df(spark, n_convs=4, base_turns=3)
    nt_path = str(tmp_path / "dump_nt")
    write_nt(observation_triples(t), nt_path)

    man = str(tmp_path / "man")
    rep = run_import_nt_job(
        spark, nt_path, str(tmp_path / "triples"), man, n_buckets=8
    )
    assert rep.state == "FINISHED" and rep.converted_triples > 0
    sent = (
        ManifestStore(spark, man)
        .read()
        .where(F.col("dataset") == BUCKETS_SENTINEL)
        .collect()
    )
    assert len(sent) == 1 and sent[0]["n_rows"] == 8
    # a transcripts run with a mismatched bucket count is rejected
    with pytest.raises(ValueError, match="n_buckets"):
        run_transcripts_job(
            spark, t, str(tmp_path / "t2"), man, n_buckets=16
        )
    # and a second import with a mismatched count too
    with pytest.raises(ValueError, match="n_buckets"):
        run_import_nt_job(
            spark, nt_path, str(tmp_path / "triples"), man, n_buckets=4
        )


def test_canonicalize_freshness_survives_clock_ties(spark, tmp_path, monkeypatch):
    """ADVICE fix: convert + canonicalize stamping the same wall-clock
    tick must not wrongly skip re-canonicalization — ordering is the
    monotonic convert-row count, not timestamps."""
    import linkedspending_spark.sources.manifest as manifest_mod

    # freeze time: every manifest row gets the identical timestamp
    monkeypatch.setattr(manifest_mod.time, "time", lambda: 1700000000.0)

    t = synth_transcripts_df(spark, n_convs=6, base_turns=3)
    half = t.where(F.col("conv_id").isin("conv-0000", "conv-0001", "conv-0002"))
    out = str(tmp_path / "triples")
    man = str(tmp_path / "man")
    canon_out = str(tmp_path / "canon")

    run_transcripts_job(spark, half, out, man, n_buckets=8)
    c1 = run_canonicalize_job(spark, out, canon_out, man)
    assert c1.skipped == 0 and c1.state == "FINISHED"
    # nothing new landed → second canonicalize is a no-op
    c2 = run_canonicalize_job(spark, out, canon_out, man)
    assert c2.skipped == 1
    # new buckets land (same frozen clock!) → canonicalize must re-run
    rep = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert rep.pending  # new buckets actually converted
    c3 = run_canonicalize_job(spark, out, canon_out, man)
    assert c3.skipped == 0 and c3.converted_triples > 0


def test_bucket_count_fallback_past_observe_cap(spark, tmp_path, monkeypatch):
    """Past OBSERVE_MAX_BUCKETS pending buckets, per-bucket counts come
    from the columnar read-back instead of Observation expressions —
    manifests must be identical either way."""
    import linkedspending_spark.jobs as jobs_mod

    t = synth_transcripts_df(spark, n_convs=6, base_turns=3, seed=41)
    # observe path
    r1 = run_transcripts_job(
        spark, t, str(tmp_path / "o1"), str(tmp_path / "m1"), n_buckets=8
    )
    # forced fallback path
    monkeypatch.setattr(jobs_mod, "OBSERVE_MAX_BUCKETS", 0)
    r2 = run_transcripts_job(
        spark, t, str(tmp_path / "o2"), str(tmp_path / "m2"), n_buckets=8
    )
    assert r1.converted_triples == r2.converted_triples > 0
    m1 = {
        (r["dataset"], r["n_triples"])
        for r in ManifestStore(spark, str(tmp_path / "m1")).read().collect()
    }
    m2 = {
        (r["dataset"], r["n_triples"])
        for r in ManifestStore(spark, str(tmp_path / "m2")).read().collect()
    }
    assert m1 == m2
