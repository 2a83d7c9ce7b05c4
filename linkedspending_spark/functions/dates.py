"""Date handling column expressions.

Reference semantics being reproduced:

* STRING_DATE parsing (ConvertWorker.java:701-723): strip a trailing
  ``+HH:MM`` timezone offset, pad date-only values (length 10) with
  ``T00:00:00.00Z``, then ISO-8601 parse; parse failures are counted,
  not fatal (error counters live in the metrics aggregation).
* structured DATE ``{year,month,day}`` → ``%04d-%02d-%02d``
  (ConvertWorker.java:724-737).
* dataset default year = first 4 chars of ``default_time``
  (ConvertWorker.java:224-230).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TZ_OFFSET_RE = r"\+\d\d:\d\d"  # ConvertWorker.java:704


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_string_date(c: Column | str) -> Column:
    """Reproduce the reference's pre-parse string surgery.

    ``2013-04-05+02:00`` → ``2013-04-05`` → ``2013-04-05T00:00:00.00Z``;
    already-timestamped values pass through with the offset stripped.
    """
    stripped = F.regexp_replace(_col(c), TZ_OFFSET_RE, "")
    return F.when(
        F.length(stripped) == 10, F.concat(stripped, F.lit("T00:00:00.00Z"))
    ).otherwise(stripped)


def parse_string_date(c: Column | str) -> Column:
    """Normalized string → timestamp; NULL on parse failure (counted upstream).

    Deliberate divergence from the reference: Java ``Instant.parse``
    (ConvertWorker.java:710) throws on the zone-less timestamp that
    offset-stripping leaves behind (``...T10:00:00.00+02:00`` →
    ``...T10:00:00.00``), counting it a parse error; ``try_to_timestamp``
    accepts it, so strictly more values convert and error counters are a
    lower bound on the reference's.
    """
    return F.try_to_timestamp(normalize_string_date(c))


def structured_date_str(year: Column | str, month: Column | str, day: Column | str) -> Column:
    """``{year,month,day}`` struct fields → zero-padded ``xsd:date`` lexical form."""
    return F.format_string("%04d-%02d-%02d", _col(year), _col(month), _col(day))


def year_of_default_time(c: Column | str) -> Column:
    """First 4 characters of ``default_time`` as the dataset default year."""
    return F.substring(_col(c), 1, 4).try_cast("int")
