"""NT-dump import + multi-format transcript readers."""
from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark.jobs import run_import_nt_job, run_transcripts_job
from linkedspending_spark.sources.io import write_nt
from linkedspending_spark.transcripts import read_transcripts, synth_transcripts_df


def test_import_nt_dump_matches_source(spark, tmp_path):
    """write pipeline → NT dump → import job: identical triple set,
    datasets recovered from subject URIs, manifests recorded."""
    t = synth_transcripts_df(spark, n_convs=6, base_turns=4, seed=23)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    run_transcripts_job(spark, t, out, man, n_buckets=4)
    src = spark.read.parquet(out)
    nt = str(tmp_path / "dump.nt")
    write_nt(src.drop("bucket", "dataset"), nt)

    imp_out, imp_man = str(tmp_path / "imp"), str(tmp_path / "imp_man")
    rep = run_import_nt_job(spark, nt, imp_out, imp_man, n_buckets=4)
    assert rep.state == "FINISHED" and rep.converted_triples > 0
    imported = spark.read.parquet(imp_out)
    a = {(r["s"], r["p"], r["o"]) for r in src.collect()}
    b = {(r["s"], r["p"], r["o"]) for r in imported.collect()}
    assert a == b
    # dataset recovery: every conversation id appears as a dataset
    datasets = {r["dataset"] for r in imported.select("dataset").distinct().collect()}
    want = {r["conv_id"] for r in t.select("conv_id").distinct().collect()}
    assert want <= datasets
    assert "__external__" not in datasets or True  # external bucket allowed


def test_read_transcripts_formats(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=3, base_turns=3, seed=31)
    # drop NT-hazard newlines for the line-oriented formats' round-trip
    t = t.withColumn("text", F.regexp_replace("text", "[\\n\\t]", " "))
    pq, js = str(tmp_path / "pq"), str(tmp_path / "js")
    t.write.parquet(pq)
    t.coalesce(1).write.json(js)
    a = {tuple(r) for r in read_transcripts(spark, pq).collect()}
    b = {tuple(r) for r in read_transcripts(spark, js, fmt="json").collect()}
    assert a == b and len(a) > 0
