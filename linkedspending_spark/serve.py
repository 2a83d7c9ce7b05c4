"""Triple-pattern query surface over materialized triple tables.

The reference serves its converted graph through SPARQL/REST
(Sparql.java:26-53 builds pattern queries; Rest.java:86-91 exposes
them). A switching user's first post-conversion need is "give me the
triples matching (s?, p?, o?)" — this module covers that 80% with a
``match`` API over the partitioned parquet/Iceberg triple table. Full
SPARQL stays out of scope (SURVEY.md §6).

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
