"""Scalar column-function library (all native expressions, codegen-friendly)."""

from .cleaning import clean_string, nullify_blank
from .dates import (
    normalize_string_date,
    parse_string_date,
    structured_date_str,
    year_of_default_time,
)
from .ngrams import char_ngrams, token_shingles
from .nt import nt_escape, nt_object_term, nt_statement

__all__ = [
    "clean_string",
    "nullify_blank",
    "normalize_string_date",
    "parse_string_date",
    "structured_date_str",
    "year_of_default_time",
    "char_ngrams",
    "token_shingles",
    "nt_escape",
    "nt_object_term",
    "nt_statement",
]
