"""Character n-grams and token shingles as native column expressions.

Feeds the trigram similarity join (LIMES ``trigrams(x,y)`` metric,
limes/dbpedia_country_source.xml:59) and the MinHash/Jaccard dedup
operators — UDF-free: ``sequence`` + ``transform`` + ``substring``
stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def char_ngrams(c: Column | str, n: int = 3) -> Column:
    """array of distinct lowercase character n-grams of a string.

    Strings shorter than ``n`` yield a single gram = the whole string
    (matches common trigram-metric behavior of padding-free LIMES).
    """
    s = F.lower(_col(c))
    length = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(length - F.lit(n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: s.substr(i, F.lit(n)))
    return F.array_distinct(grams)


def token_shingles(c: Column | str, k: int = 3) -> Column:
    """array of distinct k-token shingles (whitespace tokenization),
    joined by single spaces — the dedup-shingling primitive."""
    toks = F.split(F.trim(F.lower(_col(c))), r"\s+")
    n_tok = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n_tok - F.lit(k), F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.array_distinct(sh)
