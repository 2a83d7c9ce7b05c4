"""Triple-pattern query surface over materialized triple tables.

The reference serves its converted graph through SPARQL/REST
(Sparql.java:26-53 builds pattern queries; Rest.java:86-91 exposes
them). A switching user's first post-conversion need is "give me the
triples matching (s?, p?, o?)" — ``match`` covers that 80% over the
partitioned parquet/Iceberg triple table. The reference's own catalog
queries are conjunctive multi-pattern selects (Sparql.java:44:
``?d a qb:DataSet . ?d dcterms:modified ?m . ?d dcterms:created ?c``)
— ``select_bgp`` evaluates exactly that shape: a basic graph pattern
as a join tree of pushed-down pattern scans. A full SPARQL parser /
OPTIONAL / FILTER algebra stays out of scope (SURVEY.md §6).

Scale shape: every bound term becomes a pushed-down parquet filter
(min/max + dictionary pruning on the sorted columns), and a bound
``dataset`` additionally prunes *partitions* via the bucket column —
the scan touches only ``1/n_buckets`` of the table, shown under
``PartitionFilters`` in the physical plan (gated by pytest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_triple_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized triple table, keeping the bucket partition col."""
    return spark.read.parquet(path)


def manifest_n_buckets(spark: SparkSession, manifest_path: str) -> int | None:
    """The bucket count the table was actually written with.

    Reads the ``__n_buckets__`` config sentinel the job runners record
    on first write (jobs.py:BUCKETS_SENTINEL) — the same source the
    jobs-side resume guard trusts. Returns ``None`` for a manifest
    with no sentinel (e.g. empty store); raises if conflicting values
    were ever recorded (a corrupt store).
    """
    from .jobs import BUCKETS_SENTINEL
    from .sources.manifest import ManifestStore

    vals = sorted(
        {
            int(r["n_rows"])
            for r in ManifestStore(spark, manifest_path)
            .read()
            .where(F.col("dataset") == BUCKETS_SENTINEL)
            .select("n_rows")
            .collect()
        }
    )
    if not vals:
        return None
    if len(vals) > 1:
        raise ValueError(
            f"manifest {manifest_path} records conflicting n_buckets={vals}"
        )
    return vals[0]


def _term_filter(df: DataFrame, col: str, value) -> DataFrame:
    if value is None:
        return df
    if isinstance(value, (list, tuple, set)):
        return df.where(F.col(col).isin(*value))
    return df.where(F.col(col) == value)


def match(
    triples: DataFrame,
    s: str | Sequence[str] | None = None,
    p: str | Sequence[str] | None = None,
    o: str | Sequence[str] | None = None,
    dataset: str | None = None,
    n_buckets: int | None = None,
    manifest_path: str | None = None,
) -> DataFrame:
    """Triple-pattern match: bind any of (s, p, o, dataset); None = wildcard.

    Terms accept a single URI/literal or a list (→ ``IN``). All filters
    are native comparisons on the scan columns, so Catalyst pushes them
    into the parquet reader (``PushedFilters``). When ``dataset`` and a
    bucket count are known and the table carries the job runner's
    ``bucket`` partition column, the matching bucket is computed from
    the same ``pmod(xxhash64(dataset), n)`` rule (jobs.py:bucket_of) as
    a foldable expression — Catalyst constant-folds it and prunes all
    other partitions (``PartitionFilters``).

    The bucket count is authoritative from the WRITER, not the caller:
    pass ``manifest_path`` and it is read from the job's
    ``__n_buckets__`` sentinel (:func:`manifest_n_buckets`). A caller-
    supplied ``n_buckets`` that disagrees with the manifest raises —
    pruning with the wrong modulus selects the wrong partition and
    would silently return zero rows. A bare ``n_buckets`` with no
    manifest is trusted (documented sharp edge: it MUST match the
    writer's value).
    """
    df = triples
    if dataset is not None:
        if manifest_path is not None:
            recorded = manifest_n_buckets(triples.sparkSession, manifest_path)
            if (
                recorded is not None
                and n_buckets is not None
                and n_buckets != recorded
            ):
                raise ValueError(
                    f"n_buckets={n_buckets} does not match the value the "
                    f"table was written with ({recorded}, from manifest "
                    f"{manifest_path}); pruning would return wrong results"
                )
            n_buckets = recorded if recorded is not None else n_buckets
        if n_buckets is not None and "bucket" in df.columns:
            from .jobs import bucket_of

            df = df.where(F.col("bucket") == bucket_of(F.lit(dataset), n_buckets))
        df = df.where(F.col("dataset") == dataset)
    df = _term_filter(df, "s", s)
    df = _term_filter(df, "p", p)
    df = _term_filter(df, "o", o)
    return df


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def select_bgp(
    triples: DataFrame,
    patterns: Sequence[tuple],
    dataset: str | None = None,
    n_buckets: int | None = None,
    manifest_path: str | None = None,
) -> DataFrame:
    """Basic-graph-pattern (conjunctive) select — Sparql.java:40-53 analog.

    ``patterns`` is a sequence of ``(s, p, o)`` term triples; a term
    starting with ``?`` is a variable, anything else is a constant
    bound at that position. Returns a DataFrame with one column per
    distinct variable (named without the ``?``), columns ordered by
    first appearance, duplicate solutions kept (SPARQL SELECT without
    DISTINCT).

    Scale shape (the S2RDF/SPARQLGX plan family, re-expressed on
    Catalyst): every pattern is an independent ``match`` scan, so each
    constant is a pushed-down parquet filter and a bound ``dataset``
    still prunes bucket partitions; patterns then equi-join on their
    shared variables, with Catalyst/AQE choosing broadcast vs shuffle
    per join from the actual scan sizes. Join order is greedy
    most-constants-first, then connectivity-first — a pattern that
    shares no variable with the joined prefix is a deliberate
    cartesian product (valid SPARQL, ruinous at scale; keep BGPs
    connected). A pattern that repeats a variable (``?x p ?x``)
    becomes an in-scan equality filter; an all-constant pattern acts
    as an existence gate on the whole result (its empty/non-empty
    scan cross-joined at one row).
    """
    if not patterns:
        raise ValueError("select_bgp needs at least one pattern")
    out_order: list[str] = []
    plans: list[tuple[frozenset, DataFrame, int]] = []
    for pat_i, (s, p, o) in enumerate(patterns):
        terms = (("s", s), ("p", p), ("o", o))
        consts = {c: t for c, t in terms if not _is_var(t)}
        df = match(
            triples,
            s=consts.get("s"),
            p=consts.get("p"),
            o=consts.get("o"),
            dataset=dataset,
            n_buckets=n_buckets,
            manifest_path=manifest_path,
        )
        first_col: dict[str, str] = {}
        for c, t in terms:
            if _is_var(t):
                v = t[1:]
                if not v:
                    raise ValueError(f"bare '?' variable in pattern {(s, p, o)}")
                if v in first_col:  # ?x p ?x → positions must agree
                    df = df.where(F.col(c) == F.col(first_col[v]))
                else:
                    first_col[v] = c
                    if v not in out_order:
                        out_order.append(v)
        if first_col:
            proj = df.select(
                *[F.col(c).alias(v) for v, c in first_col.items()]
            )
        else:  # all-constant pattern: 1-row/0-row existence gate
            proj = df.limit(1).select(F.lit(1).alias(f"__exists_{pat_i}"))
        plans.append((frozenset(first_col), proj, len(consts)))

    plans.sort(key=lambda t: -t[2])
    bound, joined = plans[0][0], plans[0][1]
    rest = list(plans[1:])
    while rest:
        idx = next(
            (i for i, (vs, _, _) in enumerate(rest) if vs & bound), 0
        )
        vs, df, _ = rest.pop(idx)
        shared = sorted(vs & bound)
        joined = joined.join(df, on=shared) if shared else joined.crossJoin(df)
        bound = bound | vs
    return joined.select(*out_order)
