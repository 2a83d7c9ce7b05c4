"""Label post-processing functions (AddLanguageTags / version-scan analogs).

* F10: unicode-escape decoding + label extraction from N-Triples lines
  (AddLanguageTags.java:30-45 reads ``rdfs:label`` lines and unescapes
  ``\\uXXXX`` sequences before language detection).
* F13: transformation-version extraction from an NT line
  (``"(\\d*)"^^xsd:int`` regex at ConvertWorker.java:59,912-916) — the
  file-scan ancestor of the manifest skip predicate (P6).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import LSO_TRANSFORMATION_VERSION, NS_RDFS

_LABEL_RE = rf'^<([^>]*)> <{NS_RDFS}label> "((?:[^"\\]|\\.)*)"'
_VERSION_RE = (
    rf'^<[^>]*> <{LSO_TRANSFORMATION_VERSION}> '
    r'"(\d*)"\^\^<http://www\.w3\.org/2001/XMLSchema#int>'
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def extract_label(nt_line: Column | str) -> Column:
    """(subject, raw label lexical form) from an rdfs:label NT line."""
    return F.struct(
        F.regexp_extract(_col(nt_line), _LABEL_RE, 1).alias("s"),
        F.regexp_extract(_col(nt_line), _LABEL_RE, 2).alias("label"),
    )


@F.pandas_udf(T.StringType())
def _unesc_udf(s: pd.Series) -> pd.Series:
    pat = re.compile(r"\\u([0-9a-fA-F]{4})")
    return s.fillna("").map(lambda x: pat.sub(lambda m: chr(int(m.group(1), 16)), x))


def unicode_unescape(c: Column | str) -> Column:
    """Decode ``\\uXXXX`` escapes (vectorized Arrow UDF — needs chr())."""
    return _unesc_udf(_col(c))


def extract_transformation_version(nt_line: Column | str) -> Column:
    """NT line → version int (NULL when the line is not a version stamp)."""
    v = F.regexp_extract(_col(nt_line), _VERSION_RE, 1)
    return F.when(v != "", v.try_cast("int"))
