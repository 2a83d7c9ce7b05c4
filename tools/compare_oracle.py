"""Driver-style side-by-side comparison: Spark queries vs DuckDB oracles.

Usage: python tools/compare_oracle.py [sf_dir] [name ...]
Compares row count, sorted column names, and an order-insensitive
normalized value multiset for every registry entry (or the named ones).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from linkedspending_spark.queries import ORACLES, QUERIES  # noqa: E402
from linkedspending_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # canonicalize nested lists so the value comparison still runs —
        # but _driver_compatible() separately FAILS the entry, because the
        # driver's pandas sort_values cannot hash list cells (round-3 red
        # row). This keeps diagnostics useful without masking the defect.
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _driver_incompatible_cols(rows) -> set:
    """Column indexes holding list/tuple cells — the driver's pandas
    canonicalizer raises `unhashable type: 'list'` on these, so a registry
    entry emitting them is red in the hard signal even if values match."""
    bad = set()
    for r in rows[:50]:
        for i, v in enumerate(r):
            if isinstance(v, (list, tuple)):
                bad.add(i)
    return bad


def _key(row, cols_order):
    return tuple(_norm(row[i]) for i in cols_order)


def compare(spark, con, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    sp_cols = df.columns
    sp_rows = [tuple(r) for r in df.collect()]
    res = con.execute(ORACLES[name])
    dk_cols = [c[0] for c in res.description]
    dk_rows = res.fetchall()
    msg = []
    ok = True
    bad_cols = _driver_incompatible_cols(sp_rows)
    if bad_cols:
        ok = False
        msg.append(
            "driver-incompatible list-typed column(s): "
            + ", ".join(sorted(sp_cols[i] for i in bad_cols))
        )
    if sorted(sp_cols) != sorted(c.lower() for c in dk_cols):
        ok = False
        msg.append(f"schema: spark={sorted(sp_cols)} duck={sorted(dk_cols)}")
    if len(sp_rows) != len(dk_rows):
        ok = False
        msg.append(f"rows: spark={len(sp_rows)} duck={len(dk_rows)}")
    if ok:
        sp_order = [sp_cols.index(c) for c in sorted(sp_cols)]
        dk_lower = [c.lower() for c in dk_cols]
        dk_order = [dk_lower.index(c) for c in sorted(dk_lower)]
        a = sorted(_key(r, sp_order) for r in sp_rows)
        b = sorted(_key(r, dk_order) for r in dk_rows)
        if a != b:
            ok = False
            diff_a = [x for x in a if x not in set(b)][:3]
            diff_b = [x for x in b if x not in set(a)][:3]
            msg.append(f"values: only_spark={diff_a} only_duck={diff_b}")
    return ok, "; ".join(msg)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or list(QUERIES)
    spark = get_spark(8, app_name="compare_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_ok = n_cmp = 0
    for name in names:
        if name not in ORACLES:
            print(f"SKIP {name} (rows-only: no SQL oracle)")
            continue
        n_cmp += 1
        try:
            ok, msg = compare(spark, con, name, sf_dir)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXC {type(ex).__name__}: {str(ex)[:300]}"
        print(f"{'OK  ' if ok else 'FAIL'} {name} {msg}")
        n_ok += ok
    print(f"{n_ok}/{n_cmp} matched ({len(names) - n_cmp} rows-only skipped)")


if __name__ == "__main__":
    main()
