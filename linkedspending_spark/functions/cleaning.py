"""String cleaning (ConvertWorker.java:355-359 ``cleanString`` analog).

The reference maps ``null``, the literal string ``"null"``, and blank
strings to Java ``null`` before any triple is emitted. Expressed here as
one ``when`` chain so Catalyst folds it into the enclosing projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_string(c: Column | str) -> Column:
    """null / "null" / blank → NULL, else the trimmed-preserving original."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        col.isNull() | (F.trim(col) == "") | (F.trim(col) == "null"), F.lit(None)
    ).otherwise(col)


def nullify_blank(c: Column | str) -> Column:
    """Blank-only variant (keeps the string "null" — used for labels)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col.isNull() | (F.trim(col) == ""), F.lit(None)).otherwise(col)
