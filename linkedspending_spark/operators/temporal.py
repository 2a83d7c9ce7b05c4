"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference aligns artifacts in time by comparing modification
timestamps pairwise — "is the LinkedSpending copy newer than the
OpenSpending source" (LinkedSpendingDatasetInfo.java:102
``newestTransformation``, Rest.java:163, ConvertWorker.java:898) — a
row-at-a-time freshness check. At 10^12-turn scale the same question
("which catalog/dictionary version was current when this turn
happened?") is a bulk **as-of join**: every left row picks the latest
right row at-or-before its timestamp, per key. Its windowed sibling is
the **range join**: all right rows within a bounded time interval of a
left row, per key.

Neither is a Catalyst built-in, and the naive formulations do not
survive 100 TB:

* as-of as ``left.join(right, key & (r.ts <= l.ts)).groupBy(left)
  .agg(max_by(...))`` is a per-key cross product — quadratic in rows
  per key;
* range join as a raw ``BETWEEN`` theta-join falls back to
  BroadcastNestedLoopJoin the moment neither side broadcasts.

Scalable formulations used here:

* :func:`asof_join` — the **union + running-last** pattern: tag both
  sides, union them, and take ``last(payload, ignorenulls=True)`` over
  a window partitioned by key and ordered by (ts, side). Exactly two
  shuffles (right-side tie dedup + the window), zero row explosion,
  O(n log n) in each partition's rows. Key skew lands on the window
  shuffle; a mega-key is bounded by that key's own row count (no
  cross product), and AQE's skew handling applies to the sort.
* :func:`range_join` — **bucketed interval join**: quantize the right
  side's timestamp into fixed-width buckets, explode each left row to
  the (constant, small) set of buckets its interval overlaps, hash
  equi-join on (key, bucket), then apply the exact interval predicate
  as a residual filter. The theta-join becomes a shuffled hash join
  whose fan-out is ceil(window/bucket)+1 per left row.

Determinism for oracle parity: if several right rows share (key, ts),
"the" as-of match is ambiguous. ``asof_join`` resolves ties by
``max(struct(payload...))`` per (key, ts) — a deterministic, portable
reduction both engines can express — so results are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of left join: for every left row, the latest right
    row with the same key and ``right_ts <= left_ts`` (``<`` when
    ``inclusive=False``).

    Returns all ``left`` columns plus ``right_ts`` and the ``payload``
    columns (default: every other right column) from the matched row —
    NULL when no right row precedes the left row. Payload column names
    must not collide with left column names.

    Union + running-``last`` plan (see module docstring): no join node
    at all — one groupBy on the right side (tie dedup, map-side
    combinable) and one window shuffle on the key. Tie-break among
    right rows sharing (key, ts) is ``max(struct(payload))``.
    """
    p_cols = payload or [c for c in right.columns if c not in (right_on, right_ts)]
    overlap = set(p_cols + [right_ts]) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload collides with left columns: {sorted(overlap)}")

    # one deterministic right row per (key, ts); right_ts rides inside
    # the payload struct so the match's own timestamp comes back out
    r = (
        right.groupBy(
            F.col(right_on).alias("__k"), F.col(right_ts).alias("__t")
        )
        .agg(F.max(F.struct(*p_cols)).alias("__pay"))
        .select(
            "__k",
            "__t",
            F.struct(F.col("__t").alias(right_ts), F.col("__pay.*")).alias("__p"),
        )
    )
    p_type = r.schema["__p"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("__l")).schema["__l"].dataType

    # side ordering decides whether an exact-tie right row is visible:
    # right=0 < left=1 → included (<=); right=2 > left=1 → excluded (<)
    r_side = 0 if inclusive else 2
    u = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
        l_struct.alias("__l"),
    ).unionByName(
        r.select(
            "__k",
            "__t",
            F.lit(r_side).alias("__side"),
            "__p",
            F.lit(None).cast(l_type).alias("__l"),
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__m.{right_ts}").alias(right_ts))
    out_cols += [F.col(f"__m.{c}").alias(c) for c in p_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bucket_s: int | None = None,
) -> DataFrame:
    """Interval equi-key join: pairs (left row, right row) with the same
    key and ``left_ts + lower_s <= right_ts <= left_ts + upper_s``
    (seconds; ``lower_s`` may be negative for a look-back window).

    Returns all left columns followed by ``right_ts`` + the remaining
    right columns (names must not collide). Each qualifying pair
    appears exactly once: a right row lives in exactly one bucket and
    the left row's exploded bucket list is distinct.

    Bucketed plan (see module docstring): fan-out per left row is
    ``ceil(window/bucket)+1`` buckets — with the default
    ``bucket_s = upper_s - lower_s`` that is at most 2 — so the shuffle
    volume is O(|left| + |right|), not O(|left| × |right|) like the
    BroadcastNestedLoopJoin a raw BETWEEN theta-join degrades to.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    bucket = bucket_s or max(upper_s - lower_s, 1)
    if (upper_s - lower_s) / bucket > 64:
        raise ValueError("bucket_s too small: >64 buckets per left row")
    overlap = set(right.columns) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left columns: {sorted(overlap)}")

    # unix_timestamp, not cast("long"): TIMESTAMP_NTZ refuses a direct
    # long cast on Spark 4; the session TZ is pinned UTC so epochs are
    # portable
    lt = F.unix_timestamp(F.col(left_ts))
    r = right.withColumn("__b", F.floor(F.unix_timestamp(F.col(right_ts)) / bucket))
    l_ex = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lower_s)) / bucket),
                F.floor((lt + F.lit(upper_s)) / bucket),
            )
        ),
    )
    cond = (
        (l_ex[left_on] == r[right_on])
        & (l_ex["__b"] == r["__b"])
        & (F.unix_timestamp(r[right_ts]) >= lt + F.lit(lower_s))
        & (F.unix_timestamp(r[right_ts]) <= lt + F.lit(upper_s))
    )
    joined = l_ex.join(r, cond, "inner")
    out = [l_ex[c] for c in left.columns]
    out.append(r[right_ts])
    out += [r[c] for c in right.columns if c != right_ts]
    return joined.select(*out)
