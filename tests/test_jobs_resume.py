"""Resume-from-manifest correctness: killed run resumes without
recomputation and converges to the clean-run result (north rule)."""

from __future__ import annotations

import pytest

from linkedspending_spark.jobs import run_transcripts_job
from linkedspending_spark.sources.io import read_nt, write_nt
from linkedspending_spark.sources.manifest import ManifestStore
from linkedspending_spark.transcripts import synth_transcripts_df


def _triples_set(spark, path):
    df = spark.read.parquet(path)
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


def test_clean_run_then_skip(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=10, base_turns=4, seed=3)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert r1.state == "FINISHED" and len(r1.pending) > 0
    assert r1.converted_triples > 0
    # second run: everything skipped, output unchanged
    before = _triples_set(spark, out)
    r2 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert r2.state == "FINISHED" and r2.pending == [] and r2.converted_triples == 0
    assert _triples_set(spark, out) == before


def test_force_reconverts_all_buckets(spark, tmp_path):
    """force=True (the reference's forceConvert toggle, Job.java:156)
    re-converts every bucket with data, ignoring the done-set; the
    dynamic-partition-overwrite landing replaces — never duplicates —
    each bucket, so the output is byte-identical to the first run."""
    t = synth_transcripts_df(spark, n_convs=10, base_turns=4, seed=3)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    before = _triples_set(spark, out)
    r3 = run_transcripts_job(spark, t, out, man, n_buckets=8, force=True)
    assert r3.state == "FINISHED"
    assert r3.pending == r1.pending  # every data bucket re-converted
    assert r3.converted_triples == r1.converted_triples
    assert _triples_set(spark, out) == before  # replaced, not appended
    # the manifest now carries both runs; latest-row-wins still reads
    # every bucket as done (a plain rerun skips everything)
    r4 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert r4.pending == [] and r4.converted_triples == 0


def test_crash_resume_equals_clean_run(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=10, base_turns=4, seed=3)
    # clean reference run
    clean_out, clean_man = str(tmp_path / "c_out"), str(tmp_path / "c_man")
    run_transcripts_job(spark, t, clean_out, clean_man, n_buckets=8)
    expected = _triples_set(spark, clean_out)

    # crashed run: data written, manifests NOT recorded
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_transcripts_job(spark, t, out, man, n_buckets=8, fail_after_write=True)
    store = ManifestStore(spark, man)
    assert store.read().count() == 0  # nothing recorded

    # resume: all buckets still pending, overwrite idempotently
    r = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert r.state == "FINISHED"
    assert _triples_set(spark, out) == expected
    # one row per converted bucket plus the n_buckets config sentinel
    assert store.read().where("dataset NOT LIKE '\\_\\_%'").count() == len(r.pending)


def test_partial_manifest_resume_skips_done(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=10, base_turns=4, seed=3)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    # simulate partially-lost manifests: keep store, delete nothing —
    # instead run with MORE buckets? No: forge a fresh manifest dir with
    # only half the rows to model a mid-run kill after some records.
    store = ManifestStore(spark, man)
    rows = store.read().collect()
    half = {r["dataset"] for r in rows[: len(rows) // 2]}
    man2 = str(tmp_path / "man2")
    store2 = ManifestStore(spark, man2)
    for r in rows:
        if r["dataset"] in half:
            store2.record(r["dataset"], r["n_rows"], r["n_triples"], r["run_id"], r["version"])
    r2 = run_transcripts_job(spark, t, out, man2, n_buckets=8)
    assert r2.state == "FINISHED"
    assert set(map(str, r2.pending)).isdisjoint(half)
    assert len(r2.pending) == len(r1.pending) - len(half)


def test_nt_roundtrip(spark, tmp_path):
    """write_nt → read_nt is lossless incl. escapes (S6 + F9/F10)."""
    from linkedspending_spark.operators.convert_transcripts import convert_transcripts

    t = synth_transcripts_df(spark, n_convs=4, base_turns=5, seed=11)
    triples = convert_transcripts(spark, t).drop("dataset")
    path = str(tmp_path / "nt")
    write_nt(triples, path)
    back = read_nt(spark, path)
    a = {tuple(r) for r in triples.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_bucket_count_mismatch_rejected(spark, tmp_path):
    """Resume guard: the manifest anti-join is only valid when n_buckets
    matches the original run; a mismatch must fail loudly, not skip the
    wrong buckets."""
    t = synth_transcripts_df(spark, n_convs=6, base_turns=3, seed=5)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert r1.state == "FINISHED"
    with pytest.raises(ValueError, match="n_buckets"):
        run_transcripts_job(spark, t, out, man, n_buckets=16)
    # same bucket count still resumes cleanly
    r3 = run_transcripts_job(spark, t, out, man, n_buckets=8)
    assert r3.state == "FINISHED" and r3.pending == []


def test_write_triples_files_per_partition(spark, tmp_path):
    """The deployment file-splitting knob: >1 file per partition dir,
    same data either way."""
    from linkedspending_spark.operators.convert_transcripts import (
        convert_transcripts,
    )
    from linkedspending_spark.sources.io import write_triples
    import glob
    from pyspark.sql import functions as F

    t = synth_transcripts_df(spark, n_convs=6, base_turns=4, seed=13)
    tri = convert_transcripts(spark, t).withColumn(
        "bucket", F.pmod(F.xxhash64("dataset"), F.lit(2)).cast("int")
    )
    p1, p4 = str(tmp_path / "one"), str(tmp_path / "four")
    write_triples(tri, p1, partition_col="bucket")
    write_triples(tri, p4, partition_col="bucket", files_per_partition=4)
    n_files_1 = len(glob.glob(p1 + "/bucket=*/*.parquet"))
    n_files_4 = len(glob.glob(p4 + "/bucket=*/*.parquet"))
    assert n_files_1 == 2  # one file per bucket dir
    assert 2 < n_files_4 <= 8  # split, capped at buckets x salt
    a = {(r["s"], r["p"], r["o"]) for r in spark.read.parquet(p1).collect()}
    b = {(r["s"], r["p"], r["o"]) for r in spark.read.parquet(p4).collect()}
    assert a == b


def test_list_runs_summarizes_real_jobs(spark, tmp_path):
    """Job listing surface (Rest.java:40-91 analog): one summary row per
    run over the on-disk manifest + metrics stores, sentinels excluded,
    per-stage seconds joined in."""
    from linkedspending_spark.jobs import list_runs

    t = synth_transcripts_df(spark, n_convs=10, base_turns=4, seed=3)
    out, man, met = str(tmp_path / "out"), str(tmp_path / "man"), str(tmp_path / "met")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=8, metrics_path=met)
    rows = list_runs(spark, man, met).collect()
    assert [r["run_id"] for r in rows] == [r1.run_id]
    row = rows[0]
    assert row["n_partitions"] == len(r1.pending)
    assert row["n_triples"] == r1.converted_triples > 0
    assert row["seconds"] is not None and row["seconds"] > 0
    # no-op resume run records no partition rows -> still one run listed
    run_transcripts_job(spark, t, out, man, n_buckets=8, metrics_path=met)
    assert list_runs(spark, man).count() == 1


def test_job_history_transition_trail(spark, tmp_path):
    """Lifecycle history (Job.java:244-306 per-job history analog): a
    run with a metrics store persists its transition trail — readable
    after a 'restart' (a fresh store handle over the parquet), ordered,
    and distinct per run kind: full convert, no-op resume, cancelled."""
    from linkedspending_spark.jobs import JobCancelled, job_history

    t = synth_transcripts_df(spark, n_convs=10, base_turns=4, seed=3)
    out, man, met = str(tmp_path / "o"), str(tmp_path / "m"), str(tmp_path / "met")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=8, metrics_path=met)
    trail = job_history(spark, met, r1.run_id).collect()
    assert [r["event"] for r in trail] == [
        "submitted", "resume_resolved", "write_start", "write_end", "finished",
    ]
    assert [r["seq"] for r in trail] == [0, 1, 2, 3, 4]
    assert trail[0]["detail"] == "n_buckets=8"
    assert f"triples={r1.converted_triples}" == trail[3]["detail"]

    # no-op resume: no write phase in the trail
    r2 = run_transcripts_job(spark, t, out, man, n_buckets=8, metrics_path=met)
    trail2 = job_history(spark, met, r2.run_id).collect()
    assert [r["event"] for r in trail2] == [
        "submitted", "resume_resolved", "finished",
    ]
    assert trail2[1]["detail"] == "pending=0 skipped=8"

    # cancelled pre-write: terminal event is 'cancelled', and the trail
    # is addressable by the CALLER-minted run_id before any report exists
    with pytest.raises(JobCancelled):
        run_transcripts_job(
            spark, t, str(tmp_path / "o2"), str(tmp_path / "m2"),
            n_buckets=8, metrics_path=met, should_stop=lambda: True,
            run_id="run-hist-cancel",
        )
    trail3 = job_history(spark, met, "run-hist-cancel").collect()
    assert [r["event"] for r in trail3] == [
        "submitted", "resume_resolved", "cancelled",
    ]
    # unknown run -> empty (the REST layer turns this into a 404)
    assert job_history(spark, met, "nope").count() == 0
