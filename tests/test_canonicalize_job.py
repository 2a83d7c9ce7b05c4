"""Phase-2 canonicalization job: property-URI merge via broadcast
anchors + connected components, rewrite, dedup, resume semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkedspending_spark import model as M
from linkedspending_spark.jobs import run_canonicalize_job, run_transcripts_job
from linkedspending_spark.transcripts import synth_transcripts_df


def test_canonicalize_merges_property_uris(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=8, base_turns=4, seed=7)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    r1 = run_transcripts_job(spark, t, out, man, n_buckets=4)
    assert r1.state == "FINISHED"

    canon_out = str(tmp_path / "out_canonical")
    r2 = run_canonicalize_job(spark, out, canon_out, man)
    assert r2.state == "FINISHED" and r2.converted_triples > 0

    canon = spark.read.parquet(canon_out)
    # no per-conversation property URIs survive in predicates or subjects
    local_prop = (
        F.col("p").rlike("^" + M.PREFIX_ONTOLOGY + "conv-.*-(role|text|tool)$")
        | F.col("s").rlike("^" + M.PREFIX_ONTOLOGY + "conv-.*-(role|text|tool)$")
    )
    assert canon.where(local_prop).count() == 0
    # global anchors are present as predicates
    anchors = {
        r["p"]
        for r in canon.select("p")
        .where(F.col("p").startswith(M.PREFIX_ONTOLOGY + "transcripts-"))
        .distinct()
        .collect()
    }
    assert anchors == {
        M.PREFIX_ONTOLOGY + "transcripts-role",
        M.PREFIX_ONTOLOGY + "transcripts-text",
        M.PREFIX_ONTOLOGY + "transcripts-tool",
    }
    # observation data survived the rewrite: same count of role triples
    orig = spark.read.parquet(out)
    n_role_orig = orig.where(
        F.col("p").rlike("-role$") & F.col("s").contains("observation-")
    ).count()
    n_role_canon = canon.where(
        (F.col("p") == M.PREFIX_ONTOLOGY + "transcripts-role")
        & F.col("s").contains("observation-")
    ).count()
    assert n_role_canon == n_role_orig > 0
    # set semantics held (no duplicate statements after merge)
    assert canon.count() == canon.dropDuplicates(["s", "p", "o"]).count()


def test_canonicalize_resume_is_noop(spark, tmp_path):
    t = synth_transcripts_df(spark, n_convs=5, base_turns=3, seed=9)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    run_transcripts_job(spark, t, out, man, n_buckets=2)
    canon_out = str(tmp_path / "out_canonical")
    r1 = run_canonicalize_job(spark, out, canon_out, man)
    assert r1.state == "FINISHED" and r1.skipped == 0
    before = {
        (r["s"], r["p"], r["o"]) for r in spark.read.parquet(canon_out).collect()
    }
    r2 = run_canonicalize_job(spark, out, canon_out, man)
    assert r2.state == "FINISHED" and r2.skipped == 1 and r2.converted_triples == 0
    after = {
        (r["s"], r["p"], r["o"]) for r in spark.read.parquet(canon_out).collect()
    }
    assert before == after


def test_canonicalize_reruns_after_new_convert(spark, tmp_path):
    """Freshness: a canonicalize sentinel older than the latest convert
    manifests must NOT suppress the re-run (stale canonical table)."""
    t1 = synth_transcripts_df(spark, n_convs=4, base_turns=3, seed=2)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    canon_out = str(tmp_path / "out_canonical")
    run_transcripts_job(spark, t1, out, man, n_buckets=4)
    r1 = run_canonicalize_job(spark, out, canon_out, man)
    assert r1.state == "FINISHED" and r1.skipped == 0
    n1 = spark.read.parquet(canon_out).count()

    # new conversations land (fresh manifest path trickery not needed:
    # different conv ids hash into buckets not yet converted? instead
    # bump the version to force re-conversion of everything)
    t2 = synth_transcripts_df(spark, n_convs=9, base_turns=3, seed=2)
    run_transcripts_job(spark, t2, out, man, n_buckets=4, version=99)
    r2 = run_canonicalize_job(spark, out, canon_out, man, version=99)
    assert r2.state == "FINISHED" and r2.skipped == 0
    assert spark.read.parquet(canon_out).count() > n1
    # and a canonicalize directly after IS skipped
    r3 = run_canonicalize_job(spark, out, canon_out, man, version=99)
    assert r3.skipped == 1


def test_minimal_dedup_equals_full_dedup(spark):
    """canonicalize_triples_minimal_dedup must equal the full-shuffle
    rewrite+dropDuplicates on set-valued input, including when merges
    create real collisions (A→B where (B,p,o) already exists)."""
    from pyspark.sql import functions as F

    from linkedspending_spark.operators.canon import (
        canonicalize_triples,
        canonicalize_triples_minimal_dedup,
    )
    from linkedspending_spark.operators.convert_transcripts import (
        convert_transcripts,
    )
    from linkedspending_spark.transcripts import synth_transcripts_df

    t = synth_transcripts_df(spark, n_convs=6, base_turns=4, seed=23)
    triples = convert_transcripts(spark, t)
    # components: merge every conv's role-property URI into conv-0000's,
    # plus a self-map row (must be a no-op) — guarantees collisions
    from linkedspending_spark import model as M

    props = (
        triples.where(F.col("p").endswith("-role"))
        .select(F.col("p").alias("node"))
        .distinct()
        .withColumn("component", F.lit(M.PREFIX_ONTOLOGY + "conv-0000-role"))
    )
    comp = props.unionByName(
        spark.createDataFrame(
            [("http://x/self", "http://x/self")], "node string, component string"
        )
    )
    full = {
        tuple(r)
        for r in canonicalize_triples(triples, comp, rewrite_predicates=True)
        .dropDuplicates(["s", "p", "o"])
        .select("s", "p", "o")
        .collect()
    }
    minimal = {
        tuple(r)
        for r in canonicalize_triples_minimal_dedup(
            triples, comp, rewrite_predicates=True
        )
        .select("s", "p", "o")
        .collect()
    }
    assert minimal == full
    # and the minimal variant's output row count has no (s,p,o) dup
    out = canonicalize_triples_minimal_dedup(triples, comp, rewrite_predicates=True)
    assert (
        out.groupBy("s", "p", "o").count().where(F.col("count") > 1).count() == 0
    )
