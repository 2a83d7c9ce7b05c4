"""As-of join and range join (operators/temporal.py): planted-data
semantics, naive-join equivalence, bucket invariance, tie handling."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from linkedspending_spark.operators.temporal import asof_join, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def planted(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),  # after two rights
            (2, "u1", _ts("2024-01-01T08:00:00")),  # exact tie with r1
            (3, "u1", _ts("2024-01-01T07:00:00")),  # before every right
            (4, "u2", _ts("2024-01-01T10:00:00")),  # key with no rights
        ],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T08:00:00"), 100),
            ("u1", _ts("2024-01-01T08:00:00"), 101),  # (key, ts) tie
            ("u1", _ts("2024-01-01T09:30:00"), 200),
        ],
        "rk string, rts timestamp, rv long",
    )
    return left, right


def test_asof_backward_semantics(planted):
    left, right = planted
    got = {
        r["lid"]: (r["rts"], r["rv"])
        for r in asof_join(left, right, "k", "rk", "ts", "rts").collect()
    }
    assert got[1] == (_ts("2024-01-01T09:30:00"), 200)
    # exact tie is visible (inclusive) and resolved to max(struct(payload))
    assert got[2] == (_ts("2024-01-01T08:00:00"), 101)
    assert got[3] == (None, None)  # nothing precedes → left-join NULL
    assert got[4] == (None, None)  # key absent on the right entirely


def test_asof_exclusive_hides_exact_tie(planted):
    left, right = planted
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts", inclusive=False
        ).collect()
    }
    assert got[2] is None  # strictly-before: the 08:00 tie is invisible
    assert got[1] == 200  # later rows unaffected


def test_asof_collision_raises(planted):
    left, right = planted
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right.withColumnRenamed("rv", "lid"), "k", "rk", "ts", "rts")


def _naive_pairs(left, right, lower, upper):
    lt = F.unix_timestamp(left["ts"])
    rt = F.unix_timestamp(right["rts"])
    return {
        (r["lid"], r["rv"])
        for r in left.join(
            right,
            (left["k"] == right["rk"])
            & (rt >= lt + F.lit(lower))
            & (rt <= lt + F.lit(upper)),
        )
        .select("lid", "rv")
        .collect()
    }


@pytest.mark.parametrize("bucket", [None, 600, 3600, 7200])
def test_range_join_matches_naive_and_bucket_invariant(spark, planted, bucket):
    left, right = planted
    lower, upper = -2 * 3600, 0  # 2-hour look-back
    got = {
        (r["lid"], r["rv"])
        for r in range_join(
            left, right, "k", "rk", "ts", "rts", lower, upper, bucket_s=bucket
        )
        .select("lid", "rv")
        .collect()
    }
    assert got == _naive_pairs(left, right, lower, upper)
    assert (1, 200) in got and (1, 100) in got  # spot-check a boundary pair


def test_range_join_forward_window(spark, planted):
    left, right = planted
    # forward window: rights strictly AFTER the left row, within 3 h
    got = {
        (r["lid"], r["rv"])
        for r in range_join(left, right, "k", "rk", "ts", "rts", 1, 3 * 3600)
        .select("lid", "rv")
        .collect()
    }
    assert got == _naive_pairs(left, right, 1, 3 * 3600)
    assert (3, 100) in got and (3, 101) in got and (2, 200) in got


def test_range_join_guards(planted):
    left, right = planted
    with pytest.raises(ValueError, match="upper_s"):
        range_join(left, right, "k", "rk", "ts", "rts", 10, 5)
    with pytest.raises(ValueError, match="bucket_s too small"):
        range_join(left, right, "k", "rk", "ts", "rts", 0, 86400, bucket_s=600)
    with pytest.raises(ValueError, match="collide"):
        range_join(
            left, right.withColumnRenamed("rv", "lid"), "k", "rk", "ts", "rts", 0, 1
        )


def test_asof_plan_has_no_join_node(planted):
    """The union+running-last as-of compiles to window-over-union — no
    join operator at all (the 100-TB argument: no per-key cross
    product is even expressible in this plan)."""
    left, right = planted
    plan = asof_join(left, right, "k", "rk", "ts", "rts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
