"""Pure-Python tests for bench.py's paired-measurement harness: worker
restart budget (including death during warm-up), round salvage, and the
estimator arithmetic. No Spark — workers are monkeypatched fakes.

Why this matters: the harness is the round's perf record of record; a
worker JVM that dies mid-warm-up once zeroed the HEADLINE pair before
its sibling was even spawned (round-4 run, exec1x1 received an external
shutdown). These tests pin the recovery contract without a 25-minute
bench run.
"""

from __future__ import annotations

import pytest

import bench


class _FakeWorker:
    """Stands in for a (proc, meta) pair; scripted rep outcomes."""

    def __init__(self, label: str, secs):
        self.label = label
        # shared (not copied): a respawned worker continues the label's
        # scripted outcomes rather than replaying consumed ones
        self.secs = secs
        self.stdin = self  # .write/.flush land here

    # Popen-surface the harness touches
    def write(self, _s):
        pass

    def flush(self):
        pass

    def kill(self):
        pass

    def wait(self, timeout=None):
        return 0


def _patch(monkeypatch, spawn_script, rep_script):
    """spawn_script: list of 'ok'|'die' consumed per _spawn_worker call.
    rep_script: dict label -> list of float (rep secs) or 'die'."""
    calls = {"spawn": 0}

    def fake_spawn(label, master, replicate):
        idx = calls["spawn"]
        calls["spawn"] += 1
        if spawn_script[min(idx, len(spawn_script) - 1)] == "die":
            raise RuntimeError("flagship worker died")
        meta = {
            "master": master,
            "turns": 1000,
            "triples": 5000,
            "nt_bytes": 1 << 20,
        }
        return _FakeWorker(label, rep_script[label]), meta

    def fake_run_rep(proc):
        if not proc.secs:
            raise RuntimeError("flagship worker died")
        nxt = proc.secs.pop(0)
        if nxt == "die":
            raise RuntimeError("flagship worker died")
        return nxt

    monkeypatch.setattr(bench, "_spawn_worker", fake_spawn)
    monkeypatch.setattr(bench, "_run_rep", fake_run_rep)
    return calls


LO = ("lo", "local[1]", 1)
HI = ("hi", "local[4]", 4)


def test_pair_happy_path_estimators(monkeypatch):
    # 2 settle rounds discarded + 3 measured; perfect 4x scaling
    reps = {"lo": [40.0] * 5, "hi": [10.0] * 5}
    _patch(monkeypatch, ["ok", "ok"], reps)
    pair = bench._measure_pair(LO, HI, 1, rounds=3, probes=False)
    assert pair["scaling_efficiency"] == 1.0
    assert pair["scaling_efficiency_median_ratio"] == 1.0
    assert pair["lo"]["runs"] == [40.0] * 3 and pair["hi"]["runs"] == [10.0] * 3
    assert "aborted_after_rounds" not in pair


def test_warmup_death_is_retried(monkeypatch):
    """A worker that dies DURING WARM-UP costs a restart, not the pair
    (the round-4 failure mode: the pair died before hi was spawned)."""
    reps = {"lo": [40.0] * 5, "hi": [10.0] * 5}
    calls = _patch(monkeypatch, ["die", "ok", "ok"], reps)
    pair = bench._measure_pair(LO, HI, 1, rounds=3, probes=False)
    assert calls["spawn"] == 3  # lo died once, respawned, hi once
    assert pair["scaling_efficiency"] == 1.0
    assert "aborted_after_rounds" not in pair


def test_warmup_death_budget_exhausted(monkeypatch):
    """Three consecutive warm-up deaths exhaust the 2-restart budget and
    the pair raises (nothing measured to salvage)."""
    _patch(monkeypatch, ["die", "die", "die"], {"lo": [], "hi": []})
    with pytest.raises(RuntimeError):
        bench._measure_pair(LO, HI, 1, rounds=3, probes=False)


def test_mid_run_death_restarts_and_salvages(monkeypatch):
    """A rep failure restarts that level's worker (fresh warm JVM) and
    retries the rep; measured rounds are preserved."""
    reps = {
        # settle, settle, measured, then die -> respawned worker serves
        # the remaining reps from the same scripted list
        "lo": [40.0, 40.0, 40.0, "die", 42.0, 40.0],
        "hi": [10.0] * 5,
    }
    calls = _patch(monkeypatch, ["ok"] * 4, reps)
    pair = bench._measure_pair(LO, HI, 1, rounds=3, probes=False)
    assert calls["spawn"] == 3  # lo, hi, lo-restart
    assert len(pair["lo"]["runs"]) == 3
    assert pair["scaling_efficiency"] == 1.0  # min lo 40 / min hi 10 / 4


def test_beyond_restart_budget_salvages_completed_rounds(monkeypatch):
    """After the restart budget is spent, the pair keeps its completed
    rounds and records the abort instead of burning the whole bench."""
    reps = {
        "lo": [40.0, 40.0, 40.0, "die", "die", "die", "die"],
        "hi": [10.0] * 6,
    }
    _patch(monkeypatch, ["ok"] * 8, reps)
    pair = bench._measure_pair(LO, HI, 1, rounds=4, probes=False)
    assert pair["aborted_after_rounds"] == 1
    assert pair["lo"]["runs"] == [40.0] and pair["hi"]["runs"] == [10.0]
    assert pair["scaling_efficiency"] == 1.0


def test_min_based_estimator_ignores_one_sided_noise(monkeypatch):
    """Tenant noise is additive: contaminated reps inflate medians but
    not minima — the headline stays on the clean cost ratio while the
    median-ratio form documents the contamination."""
    reps = {
        "lo": [40.0, 40.0, 40.0, 41.0, 40.5],
        "hi": [10.0, 10.0, 30.0, 30.0, 10.0],  # 2/3 measured reps dirty
    }
    _patch(monkeypatch, ["ok"] * 8, reps)
    pair = bench._measure_pair(LO, HI, 1, rounds=3, probes=False)
    assert pair["scaling_efficiency"] == 1.0  # min 40 / min 10 / 4
    # the median sits ON a contaminated rep: (40/30)/4
    assert pair["scaling_efficiency_median_ratio"] < 0.5
    assert len(pair["hi"]["runs"]) == 3


def test_compact_line_fits_driver_tail():
    """The stdout summary of a fully-populated record stays under the
    driver's 2,000-char tail window (round-3's 3,268-char line is why
    BENCH_r03.parsed is null)."""
    import json

    pair = {
        "lo": {"master": "local[8]", "threads": 8, "sec": 12.3,
               "sec_min": 11.4, "runs": [12.3] * 17,
               "triples_per_sec": 8497610.6, "nt_gbps": 1.28,
               "turns": 9600000, "triples": 104797632,
               "nt_bytes": 16989251488},
        "hi": {"master": "local[32]", "threads": 32, "sec": 7.2,
               "sec_min": 6.7, "runs": [7.2] * 17,
               "triples_per_sec": 14448667.7, "nt_gbps": 2.18,
               "turns": 9600000, "triples": 104797632,
               "nt_bytes": 16989251488},
        "scaling_efficiency": 0.426,
        "scaling_efficiency_median_ratio": 0.425,
        "scaling_efficiency_paired_median": 0.436,
        "scaling_efficiency_min_based": 0.426,
        "scaling_efficiency_clean": 0.425,
        "per_round_efficiency": [0.43] * 17,
        "host_cpu_ceiling": 1.0,
        "host_bw_read_ceiling": 0.551,
        "host_bw_write_ceiling": 0.345,
        "host_cpu_ceiling_per_round": [0.7] * 17,
        "host_bw_read_ceiling_per_round": [0.5] * 17,
        "host_bw_write_ceiling_per_round": [0.3] * 17,
        "host_normalized_efficiency": 0.426,
        "bandwidth_normalized_efficiency": 0.773,
        "write_bw_normalized_efficiency": 1.235,
        "clean_reps": {"lo": 17, "hi": 17},
        "speedup": 1.7,
    }
    full = {
        "metric": "headline_queries_total",
        "value": 12.636,
        "unit": "sec",
        "queries": {name: 1.234 for name in bench.BENCH_QUERIES},
        "sf": 0.1,
        "pipeline": {
            "convert_passes": [10.39, 8.574],
            "canonicalize_passes": [13.095, 10.051],
            "convert_sec": 8.574, "canonicalize_sec": 10.051,
            "triples": 1091642, "canonical_triples": 1082648,
            "state": "FINISHED",
        },
        "flagship": {"pair_exec_1_4": dict(pair), "pair_8_32": dict(pair)},
    }
    line = json.dumps(bench._compact(full))
    assert len(line) < 1990, len(line)
