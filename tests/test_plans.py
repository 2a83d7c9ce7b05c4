"""Physical-plan audit as a test gate (tools/plan_audit.py).

A representative subset of the registry — covering every audit rule:
broadcast-dict joins, parquet filter pushdown, column pruning caps,
codegen presence, and the no-row-Python rule — must produce clean
plans. AQE is toggled off around plan construction only (runtime
conf), since the un-finalized AdaptiveSparkPlan hides codegen markers.
"""

from __future__ import annotations

import pytest

from linkedspending_spark.queries import QUERIES
from tools.plan_audit import audit_one, plan_of

SUBSET = [
    "obs_triples",  # flagship + Arrow UDF declaration
    "mention_triples",  # broadcast dict join + Arrow UDF
    "broadcast_lookup",  # J1 broadcast
    "territory_links",  # J2 explode + broadcast
    "set_ops",  # pushdown + broadcast (subsumes anti_join)
    "sig_profile",  # pushdown (subsumes minhash_sig)
    "corpus_stats",  # pruning cap (count needs no data columns)
    "token_stats",  # pruning cap
    "group_agg",  # codegen agg
    "window_order",  # codegen window
]


@pytest.fixture(scope="module")
def no_aqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev)


@pytest.mark.parametrize("name", SUBSET)
def test_plan_clean(no_aqe, sf_dir, name):
    plan = plan_of(QUERIES[name](no_aqe, sf_dir))
    errs = audit_one(name, plan)
    assert not errs, f"{name}: {errs}\n{plan[:4000]}"
