"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus BOTH two-parallelism-level scaling checks:

* **pair 8→32** — the prescribed sandbox stand-in for N vs 4N executors
  (BASELINE.json north rule / driver instruction: local[8] vs local[32]
  on the same input). This is the BINDING pair.
* **pair 1→4** — the bandwidth-isolated pair (this shared 32-vCPU box's
  memory bus saturates above ~8 concurrent threads; 1→4 varies core
  count without crossing that wall).

TWO multiprocessing probes measure the HOST's own 8→32 parallel
ceilings inside every measurement round (no Spark): a pure-CPU probe
(integer arithmetic — SMT/core-contention ceiling, ~0.74 here) and a
memory-bandwidth probe (numpy streaming sums, ~1 GB traffic/unit —
the memory-bus ceiling, measured 0.48–0.67 here depending on box
state). The flagship serializes ~17 GB of N-Triples per rep: it is a
bandwidth-heavy workload, so the bandwidth probe is the ceiling MATCHED
to it; both normalizations are reported next to the raw figure. The
probes run inside every round's window (the box changes minute-to-
minute — a single before/after probe can measure a different machine
than the reps it normalizes), and each normalization is the ratio of
MEDIANS across rounds (robust to a single corrupted probe window).

Flagship job = the full KG-construction pipeline: events-derived
transcripts (replicated with distinct conv_ids) → observation/dataset/
mention triples (dedup="auto": the native path is provably set-valued,
see convert_transcripts docstring — no dedup shuffle) → N-Triples
serialization → count+byte reduce. Methodology for a fair
strong-scaling measurement on one shared box:

* identical partition count (64) and identical input at both levels of
  a pair — same work units, only concurrency differs;
* the transformation DAG is built ONCE per level (as a real pipeline
  does); each rep executes the full physical computation via a fresh
  aggregation (new QueryExecution → no stage/shuffle reuse), so
  driver-side py4j expression construction (~1.2 s, size-independent)
  is not billed to every rep of a seconds-long sandbox job;
* **interleaved levels** (round-2 VERDICT item 2): both levels run as
  persistent warm worker JVMs (fresh JVM each, one Spark session, one
  warm-up job), and the parent alternates single reps lo,hi,lo,hi,…
  with only one executing at a time. Shared-box drift (another tenant
  waking up mid-bench) hits adjacent reps of BOTH levels instead of
  one whole level, and the per-round ratio t_lo/t_hi cancels it;
* per-rep work is sized so the FAST level runs ≥10 s (replicate ×12
  for the 8→32 pair: BASELINE.md's ≥10 s rule applied to both levels,
  not just the slow one), amortizing fixed driver/scheduler latency;
* efficiency = MEDIAN of per-round paired ratios (robust to spikes);
  min-based efficiency and raw per-rep lists are reported next to it.

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "pipeline": {...},
 "flagship": {"pair_8_32": {...binding, incl. per-round host ceilings
              and normalized efficiencies...}, "pair_1_4": {...}}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "8"))
PARTITIONS = int(os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "64"))

# headline operator subset (full registry is validated by the driver's
# correctness pass; bench times representative heavy hitters).  Names and
# computations are kept IDENTICAL round-over-round: entries the round-3
# registry consolidation folded into profile queries (conv_completeness,
# minhash_sig, quality_score) are timed via their original q_* functions.
BENCH_QUERIES = [
    "obs_triples",
    "mention_triples",
    "conv_completeness",
    "group_agg",
    "window_order",
    "topk_per_group",
    "dedup_exact",
    "minhash_sig",
    "shingle_jaccard",
    "ann_cosine",
    "quality_score",
    "territory_links",
    "date_parse_stats",
    # round-2 heavy operators: banded-LSH linking, iterative CC, exact-Lloyd IVF
    "lsh_join",
    "connected_components",
    "ivf_topk",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _cpu_unit(_: int) -> int:
    # pure integer arithmetic, no memory traffic: measures the host's
    # core-count scaling ceiling, not the memory bus
    acc = 0
    for i in range(1_500_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return acc


def _bw_unit(_: int) -> int:
    # streaming memory traversal (numpy C loop, ~1.25 GB of traffic per
    # unit, negligible arithmetic): measures the host's MEMORY-BANDWIDTH
    # scaling ceiling — the wall a string-serialization workload actually
    # hits — where the pure-CPU probe by construction cannot see it
    import numpy as np

    a = np.ones(8 * 1024 * 1024, dtype=np.int64)  # 64 MB (small enough
    s = 0  # that 32 concurrent workers don't themselves evict the page
    for _ in range(16):  # cache the Spark reps depend on)
        s += int(a.sum())
    return s


def _wr_unit(_: int) -> int:
    # pure write stream (numpy fill): measures the host's WRITE-
    # bandwidth scaling ceiling. Measured here: ~31 GB/s at 8 workers,
    # ~34 GB/s at 32 — writes saturate the bus ALREADY AT 8 THREADS
    # (efficiency ~0.28). An allocation-heavy workload (string
    # serialization writes every output byte at least twice) is bounded
    # by a ceiling between this and the read-stream one.
    import numpy as np

    a = np.empty(8 * 1024 * 1024, dtype=np.int64)  # 64 MB
    for i in range(16):
        a.fill(i)
    return int(a[0])


def wr_probe(lo: int = 8, hi: int = 32, units: int = 64) -> dict:
    """Write-bandwidth multiprocessing scaling probe (numpy fills)."""
    return _probe(_wr_unit, lo, hi, units, bytes_per_unit=1.0 * 1024**3)


def host_probe(lo: int = 8, hi: int = 32, units: int = 128) -> dict:
    """Pure-CPU multiprocessing scaling probe: same work at lo and hi
    worker counts; efficiency = (T_lo / T_hi) / (hi / lo)."""
    return _probe(_cpu_unit, lo, hi, units)


def bw_probe(lo: int = 8, hi: int = 32, units: int = 64) -> dict:
    """Memory-bandwidth multiprocessing scaling probe (numpy streaming
    sums). Even this most-parallel-possible memory workload scales at
    only ~0.5–0.7 efficiency from 8→32 threads on this box — the
    denominator matched to a bandwidth-bound flagship. Reports the
    absolute aggregate GB/s at each level (1.25 GB traffic per unit) so
    the flagship's own effective byte rate can be compared against the
    bus ceiling directly, not only as a ratio of ratios."""
    return _probe(_bw_unit, lo, hi, units, bytes_per_unit=1.0625 * 1024**3)


def _probe(unit, lo: int, hi: int, units: int, bytes_per_unit: float = 0.0) -> dict:
    from concurrent.futures import ProcessPoolExecutor

    out = {}
    for workers in (hi, lo):  # hot caches by running hi first
        with ProcessPoolExecutor(max_workers=workers) as ex:
            list(ex.map(unit, range(workers)))  # warm the pool
            t0 = time.perf_counter()
            list(ex.map(unit, range(units)))
            out[f"t{workers}"] = round(time.perf_counter() - t0, 3)
            if bytes_per_unit:
                out[f"gbps{workers}"] = round(
                    units * bytes_per_unit / out[f"t{workers}"] / 1024**3, 2
                )
    out["efficiency"] = round(out[f"t{lo}"] / out[f"t{hi}"] / (hi / lo), 3)
    return out


def _flagship_session(cpus: int, sf_dir: str, replicate: int):
    """Warm flagship setup: session, cached input, transformation DAG,
    one warm-up execution. Returns (spark, job, meta)."""
    from pyspark.sql import functions as F

    from linkedspending_spark.operators.convert_transcripts import convert_transcripts
    from linkedspending_spark.session import get_spark
    from linkedspending_spark.sources.io import nt_lines
    from linkedspending_spark.transcripts import transcripts_from_events

    # AQE off for the flagship measurement: its stage barriers cost ~1.3 s
    # of driver latency per job at local[32] (measured), pure overhead for
    # a fixed-shape, skew-free job whose plan needs no runtime re-planning.
    # On a real cluster with multi-minute stages the barrier cost vanishes
    # and AQE stays on (session default) for skew-join splitting.
    spark = get_spark(
        cpus,
        app_name=f"bench_flagship_{cpus}",
        shuffle_partitions=PARTITIONS,
        extra_conf={
            "spark.locality.wait": "0",
            "spark.sql.adaptive.enabled": "false",
            # ParallelGC, measured on this box: ~same at local[8]
            # (9.8 vs 9.9 s) but 15-27% faster at local[32] (3.2-4.5
            # vs 4.4-5.2 s) — G1's concurrent/STW overhead was a big
            # share of the 8→32 scaling loss for this allocation-heavy
            # string-serialization job. Overridable via env.
            # measured on this box (steady-state local[32] reps at
            # replicate x12): G1 11.2 s -> ParallelGC 9.1-10.4 s ->
            # +10g young gen & pretouch 7.8-8.6 s. ParallelGC's first
            # 2-3 reps are polluted by adaptive survivor sizing and
            # heap-growth full GCs (observed 30 s pauses during cache
            # build) — the pair measurement discards two settle rounds.
            "spark.driver.extraJavaOptions": (
                os.environ.get("SPARK_GRAFT_JAVA_OPTS")
                or "-XX:+UseParallelGC -Xmn10g -XX:+AlwaysPreTouch"
            ),
        },
    )
    t = transcripts_from_events(spark, sf_dir)
    big = (
        t.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn("conv_id", F.concat_ws("-r", "conv_id", "rep"))
        .drop("rep")
        .repartition(PARTITIONS, "conv_id")
        .persist()
    )
    n_turns = big.count()  # materialize the cached input

    # build the transformation DAG once (py4j expression construction is
    # driver-serial and size-independent — a real job pays it once)
    lines = nt_lines(convert_transcripts(spark, big))

    def job() -> tuple[int, int]:
        # fresh aggregation per rep → new QueryExecution → full physical
        # re-execution (no stage reuse), ~4 py4j calls
        row = lines.agg(
            # octet_length is O(1) per row on UTF8String; length() would
            # re-walk every built line to count codepoints — a second
            # full traversal of the serialized corpus, and chars ≠ bytes
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("value")).alias("bytes"),
        ).collect()[0]
        return row["n"], row["bytes"]

    n_triples, nt_bytes = job()  # full warm-up (JIT, codegen, broadcasts)
    meta = {"cpus": cpus, "turns": n_turns, "triples": n_triples, "nt_bytes": nt_bytes}
    return spark, job, meta


def flagship_worker(cpus: int, sf_dir: str, replicate: int) -> None:
    """Persistent warm worker: builds the flagship once, then executes
    one timed rep per RUN line on stdin (EXIT stops). Only JSON goes to
    stdout; the parent interleaves RUNs across two workers so shared-box
    drift lands on both levels symmetrically."""
    spark, job, meta = _flagship_session(cpus, sf_dir, replicate)
    print(json.dumps({"ready": True, **meta}), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "RUN":
            t0 = time.perf_counter()
            job()
            print(json.dumps({"sec": round(time.perf_counter() - t0, 4)}), flush=True)
        elif cmd == "EXIT":
            break
    spark.stop()


def _read_json_line(proc) -> dict:
    while True:
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError("flagship worker died")
        if line.startswith("{"):
            return json.loads(line)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _measure_pair(
    lo: int, hi: int, replicate: int, rounds: int = 5, probes: bool = False
) -> dict:
    """Interleaved paired measurement of one scaling pair.

    Starts one persistent warm worker JVM per level (warm-ups run
    sequentially), then alternates single reps lo,hi,lo,hi,… Per-round
    efficiency = (t_lo/t_hi)/(hi/lo); the MEDIAN of those per-round
    ratios is the headline (a tenant-noise spike inflates one rep, not
    the paired ratio trend); min-based efficiency is reported alongside
    for comparability with earlier rounds.

    With ``probes=True``, every round ALSO runs the pure-CPU and the
    memory-bandwidth multiprocessing probes at both levels, inside the
    same ~1-minute window as that round's Spark reps — so each round
    gets a host ceiling measured under the SAME box conditions; the
    normalized efficiencies are ratios of MEDIANS across rounds, so
    neither a single corrupted probe window nor the box changing
    between a lone before/after probe and the reps it is supposed to
    normalize can skew them.
    """
    workers: dict[int, subprocess.Popen] = {}
    meta: dict[int, dict] = {}
    pair: dict = {}
    cpu_ceils: list[float] = []
    bw_ceils: list[float] = []
    wr_ceils: list[float] = []
    settle = 2  # discarded rounds: ParallelGC adaptive sizing + heap
    # growth pollute the first reps (observed: 30 s full-GC pauses
    # during settle, then clean steady state)
    try:
        for cpus in (lo, hi):  # sequential warm-up: no contention
            p = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--flagship-worker",
                 "--cpus", str(cpus), "--replicate", str(replicate)],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True, bufsize=1,
                env={**os.environ},
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            workers[cpus] = p
            meta[cpus] = _read_json_line(p)  # blocks until warm
        runs: dict[int, list[float]] = {lo: [], hi: []}
        for rnd in range(rounds + settle):
            for cpus in (lo, hi):
                workers[cpus].stdin.write("RUN\n")
                workers[cpus].stdin.flush()
                sec = _read_json_line(workers[cpus])["sec"]
                if rnd >= settle:
                    runs[cpus].append(sec)
            if probes and rnd >= settle:
                cpu_ceils.append(host_probe(lo, hi)["efficiency"])
                bw_ceils.append(bw_probe(lo, hi)["efficiency"])
                wr_ceils.append(wr_probe(lo, hi)["efficiency"])
    finally:
        for p in workers.values():
            try:
                p.stdin.write("EXIT\n")
                p.stdin.flush()
            except Exception:
                pass
        for p in workers.values():
            try:
                p.wait(timeout=60)
            except Exception:
                p.kill()

    for cpus in (lo, hi):
        m = meta[cpus]
        sec_med, sec_min = _median(runs[cpus]), min(runs[cpus])
        pair[f"local{cpus}"] = {
            "cpus": cpus,
            "turns": m["turns"],
            "triples": m["triples"],
            "nt_bytes": m["nt_bytes"],
            "sec": round(sec_med, 3),
            "sec_min": round(sec_min, 3),
            "runs": [round(r, 3) for r in runs[cpus]],
            "triples_per_sec": round(m["triples"] / sec_med, 1),
            # final-NT bytes/sec: a LOWER bound on the job's memory
            # traffic (intermediate URI/term strings add multiples of
            # this) — compare against the bw probe's gbps at this level
            "nt_gbps": round(m["nt_bytes"] / sec_med / 1024**3, 2),
        }
    ratio = hi / lo
    per_round_eff = [
        (tl / th) / ratio for tl, th in zip(runs[lo], runs[hi])
    ]
    pair["per_round_efficiency"] = [round(e, 3) for e in per_round_eff]
    pair["speedup"] = round(_median(runs[lo]) / _median(runs[hi]), 3)
    pair["scaling_efficiency"] = round(_median(per_round_eff), 3)
    pair["scaling_efficiency_min_based"] = round(
        (min(runs[lo]) / min(runs[hi])) / ratio, 3
    )
    if probes and cpu_ceils:
        # ratio of MEDIANS, not median of per-round ratios: a single
        # corrupted probe window (a tenant spike can push one bw-probe
        # reading to 0.08 — observed) would explode that round's
        # normalized ratio, and with few rounds the median of ratios
        # isn't safe. Medians of each series are; per-round lists stay
        # in the output for inspection. Ceilings clamp to 1.0 — a
        # measured super-linear probe is cache warm-up, not a ceiling.
        pair["host_cpu_ceiling_per_round"] = [round(c, 3) for c in cpu_ceils]
        pair["host_bw_read_ceiling_per_round"] = [round(c, 3) for c in bw_ceils]
        pair["host_bw_write_ceiling_per_round"] = [round(c, 3) for c in wr_ceils]
        cpu_ceil = min(_median(cpu_ceils), 1.0)
        bw_ceil = min(_median(bw_ceils), 1.0)
        wr_ceil = min(_median(wr_ceils), 1.0)
        pair["host_cpu_ceiling"] = round(cpu_ceil, 3)
        pair["host_bw_read_ceiling"] = round(bw_ceil, 3)
        pair["host_bw_write_ceiling"] = round(wr_ceil, 3)
        eff = pair["scaling_efficiency"]
        # cpu-normalized: vs the core/SMT ceiling only (ignores the
        # memory system — the HARSHEST denominator for a memory-heavy
        # job). read-normalized: vs the read-stream bus ceiling — the
        # CONSERVATIVE memory ceiling (the write-stream one is far
        # lower, ~0.28: writes saturate at 8 threads on this box, and
        # serialization writes every output byte at least twice; a
        # mixed-traffic job's true ceiling lies between the two).
        pair["host_normalized_efficiency"] = round(eff / cpu_ceil, 3)
        pair["bandwidth_normalized_efficiency"] = round(eff / bw_ceil, 3)
        pair["write_bw_normalized_efficiency"] = round(eff / wr_ceil, 3)
    return pair


def main() -> None:
    if "--flagship-worker" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        rep = (
            int(sys.argv[sys.argv.index("--replicate") + 1])
            if "--replicate" in sys.argv
            else REPLICATE
        )
        flagship_worker(cpus, SF_DIR, rep)
        return

    import linkedspending_spark.queries as Q
    from linkedspending_spark.session import get_spark

    bench_fns = {name: getattr(Q, f"q_{name}") for name in BENCH_QUERIES}
    spark = get_spark(CPUS, app_name="bench")
    # warm the session: scan + the shared transcripts derivation (window
    # shuffle, codegen) so the first measured query doesn't absorb
    # one-time JIT/planner costs
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    from linkedspending_spark.transcripts import transcripts_from_events

    transcripts_from_events(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        bench_fns[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # end-to-end resumable pipeline (convert + manifests + canonicalize)
    # in the warm session — the deployment-shaped job, not just operators
    import shutil
    import tempfile

    from linkedspending_spark.jobs import run_canonicalize_job, run_transcripts_job

    tmp = tempfile.mkdtemp(prefix="bench_pipe_")
    pipeline: dict = {}
    try:
        t0 = time.perf_counter()
        rep = run_transcripts_job(
            spark,
            transcripts_from_events(spark, SF_DIR),
            out_path=f"{tmp}/triples",
            manifest_path=f"{tmp}/man",
            n_buckets=64,
        )
        convert_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        canon = run_canonicalize_job(
            spark, f"{tmp}/triples", f"{tmp}/triples_canonical", f"{tmp}/man"
        )
        pipeline = {
            "convert_sec": round(convert_sec, 3),
            "canonicalize_sec": round(time.perf_counter() - t0, 3),
            "triples": rep.converted_triples,
            "canonical_triples": canon.converted_triples,
            "state": canon.state,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    # scaling: the BINDING north-rule pair (8→32) on 12× input so the
    # FAST level's reps stay ≥10 s (BASELINE.md's rule at both levels),
    # with per-round pure-CPU AND memory-bandwidth host-ceiling probes
    # interleaved inside each round's window (see _measure_pair), plus
    # the bandwidth-isolated 1→4 pair (no normalization needed there).
    flagship: dict = {}
    time.sleep(3)
    flagship["pair_8_32"] = _measure_pair(
        8, 32, REPLICATE * 12, rounds=7, probes=True
    )
    flagship["pair_1_4"] = _measure_pair(1, 4, REPLICATE)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(SF_DIR),
                "pipeline": pipeline,
                "flagship": flagship,
            }
        )
    )


if __name__ == "__main__":
    main()
