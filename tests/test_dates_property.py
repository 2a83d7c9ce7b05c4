"""Property-based tests: date normalization/parse chain vs a pure-Python
oracle re-implementing ConvertWorker.java:701-723 semantics."""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

TZ_RE = re.compile(r"\+\d\d:\d\d")


def _python_oracle(raw: str) -> dt.datetime | None:
    """Strip +HH:MM offset, pad date-only with T00:00:00.00Z, ISO-parse.

    Mirrors the ENGINE's semantics: unlike Java ``Instant.parse``
    (which errors on a zone-less timestamp left behind by offset
    stripping), ``try_to_timestamp`` accepts it — strictly more values
    convert, a documented deliberate divergence from the reference.
    """
    s = TZ_RE.sub("", raw)
    if len(s) == 10:
        s = s + "T00:00:00.00Z"
    for fmt in ("%Y-%m-%dT%H:%M:%S.00Z", "%Y-%m-%dT%H:%M:%S.00"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


_dates = st.datetimes(
    min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2099, 12, 31)
).map(lambda d: d.replace(microsecond=0))

_variants = st.sampled_from(["date_only", "iso_z", "iso_offset"])

_garbage = st.text(
    alphabet="0123456789-T:+Zabc ", min_size=0, max_size=24
)


def _render(d: dt.datetime, variant: str) -> str:
    if variant == "date_only":
        return d.strftime("%Y-%m-%d")
    if variant == "iso_z":
        return d.strftime("%Y-%m-%dT%H:%M:%S.00Z")
    return d.strftime("%Y-%m-%dT%H:%M:%S.00+02:00")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_dates, _variants), min_size=1, max_size=16))
def test_parse_string_date_matches_python_oracle(cases):
    from pyspark.sql import functions as F

    from linkedspending_spark.functions import parse_string_date
    from linkedspending_spark.session import get_spark

    spark = get_spark(8, app_name="ls_tests")
    raws = [_render(d, v) for d, v in cases]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = {
        r["raw"]: r["p"]
        for r in df.select(
            "raw", F.date_format(parse_string_date("raw"), "yyyy-MM-dd'T'HH:mm:ss").alias("p")
        ).collect()
    }
    for raw in raws:
        want = _python_oracle(raw)
        want_s = want.strftime("%Y-%m-%dT%H:%M:%S") if want else None
        assert got[raw] == want_s, raw


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_garbage, min_size=1, max_size=16))
@example(["0000-01-01"])  # parses to year 0: JVM-valid, outside Python datetime
def test_parse_string_date_never_throws_on_garbage(raws):
    """Parse failures must be NULL, never exceptions (counted upstream)."""
    from pyspark.sql import functions as F

    from linkedspending_spark.functions import parse_string_date
    from linkedspending_spark.session import get_spark

    spark = get_spark(8, app_name="ls_tests")
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    # format to string like every engine surface does — a raw collect of
    # year-0 timestamps (e.g. parsed "0000-01-01") is outside Python's
    # datetime range even though the JVM value is fine
    rows = df.select(
        "raw",
        F.date_format(parse_string_date("raw"), "yyyy-MM-dd'T'HH:mm:ss").alias("p"),
    ).collect()
    assert len(rows) == len(raws)  # completed without raising
