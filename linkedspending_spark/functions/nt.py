"""N-Triples serialization as native column expressions (no Python UDF).

The reference delegates to Jena's N-TRIPLE writer
(ConvertWorker.java:862-868). Here the escaping rules of the N-Triples
spec (backslash, double quote, LF, CR, TAB) are a chain of
``regexp_replace``/``replace`` expressions, so serialization stays
inside whole-stage codegen — the SURVEY.md §7 "temptation point" for
per-row Python, done vectorized instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import KIND_URI


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nt_escape(c: Column | str) -> Column:
    """Escape a literal's lexical form per N-Triples rules.

    Backslash first (so later escapes aren't double-escaped), then
    quote, LF, CR, TAB. A single ``rlike`` guard over exactly that
    character class lets the common clean-literal case skip all five
    allocation passes (~16% off the serialization stage; round-trip
    property-tested in tests/test_streaming_misc.py).
    """
    col = _col(c)
    esc = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit('"'), F.lit('\\"'))
    esc = F.replace(esc, F.lit("\n"), F.lit("\\n"))
    esc = F.replace(esc, F.lit("\r"), F.lit("\\r"))
    esc = F.replace(esc, F.lit("\t"), F.lit("\\t"))
    return F.when(col.rlike('[\\\\"\n\r\t]'), esc).otherwise(col)


def nt_object_term(
    o: Column | str,
    o_kind: Column | str,
    o_datatype: Column | str,
    o_lang: Column | str,
) -> Column:
    """Render the object position: ``<uri>``, ``"lit"``, ``"lit"@lang``,
    or ``"lit"^^<datatype>``."""
    o, kind, dt, lang = _col(o), _col(o_kind), _col(o_datatype), _col(o_lang)
    quoted = F.concat(F.lit('"'), nt_escape(o), F.lit('"'))
    return (
        F.when(kind == KIND_URI, F.concat(F.lit("<"), o, F.lit(">")))
        .when(lang.isNotNull(), F.concat(quoted, F.lit("@"), lang))
        .when(dt.isNotNull(), F.concat(quoted, F.lit("^^<"), dt, F.lit(">")))
        .otherwise(quoted)
    )


def nt_statement(
    s: Column | str = "s",
    p: Column | str = "p",
    o: Column | str = "o",
    o_kind: Column | str = "o_kind",
    o_datatype: Column | str = "o_datatype",
    o_lang: Column | str = "o_lang",
) -> Column:
    """Full N-Triples line ``<s> <p> <term> .``

    The object-kind CASE sits OUTSIDE the concat and each branch holds
    the WHOLE line's concat, not just the object term: Catalyst's
    CombineConcats then flattens every branch (including concat-minted
    s/p/o URIs from upstream projections) into one flat ``concat``, so
    each output byte is written exactly once into one buffer. The
    obvious shape — ``concat(prefix, CASE(concat(term)...), suffix)``
    — evaluates an inner concat and copies its result again in the
    outer one, doubling serialization write traffic; write bandwidth
    is the measured scaling wall on the bench box (write streams
    saturate at 8 threads), so the copy is the one to kill.
    """
    s, p, o = _col(s), _col(p), _col(o)
    kind, dt, lang = _col(o_kind), _col(o_datatype), _col(o_lang)

    def line(*object_parts: Column) -> Column:
        return F.concat(
            F.lit("<"), s, F.lit("> <"), p, F.lit("> "), *object_parts, F.lit(" .")
        )

    quote, esc = F.lit('"'), nt_escape(o)
    return (
        F.when(kind == KIND_URI, line(F.lit("<"), o, F.lit(">")))
        .when(lang.isNotNull(), line(quote, esc, F.lit('"@'), lang))
        .when(
            dt.isNotNull(), line(quote, esc, F.lit('"^^<'), dt, F.lit(">"))
        )
        .otherwise(line(quote, esc, quote))
    )
