"""SPARQL 1.1 subqueries (§12): ``{ SELECT ... }`` nested groups.

Evaluated bottom-up (per spec): the inner SELECT runs through the same
``select_text`` pipeline (its own projection / DISTINCT / ORDER BY /
LIMIT — the whole point of a subquery), then joins the outer solution
on the shared variables as a pre-evaluated ``("solutions", ...)`` group.
"""

from __future__ import annotations

import pytest

from linkedspending_spark.sparql import (
    SparqlSyntaxError,
    parse_select,
    select_text,
)

PRE = "PREFIX p: <p:> PREFIX u: <u:> "


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        ("u:a", "p:knows", "u:b", "uri", None, None),
        ("u:b", "p:knows", "u:c", "uri", None, None),
        ("u:c", "p:knows", "u:d", "uri", None, None),
        ("u:a", "p:name", "Alice", "literal", None, None),
        ("u:b", "p:name", "Bob", "literal", None, None),
        ("u:c", "p:name", "Cara", "literal", None, None),
        ("u:a", "p:age", "30", "literal", None, None),
        ("u:b", "p:age", "40", "literal", None, None),
        ("u:c", "p:age", "40", "literal", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )


def _run(graph, q, **kw):
    return sorted(
        tuple(r) for r in select_text(graph, PRE + q, **kw).collect()
    )


def test_subquery_joins_on_shared_var(graph):
    got = _run(
        graph,
        'SELECT ?s ?n { ?s p:name ?n { SELECT ?s { ?s p:age "40" } } }',
    )
    assert got == [("u:b", "Bob"), ("u:c", "Cara")]


def test_join_on_subquery_max(graph):
    """The canonical subquery shape: bind the global MAX inside, join
    outside — the aggregate alias over an always-bound operand counts
    as bound."""
    got = _run(
        graph,
        "SELECT ?s { ?s p:age ?m "
        "{ SELECT (MAX(?a) AS ?m) { ?x p:age ?a } } }",
    )
    assert got == [("u:b",), ("u:c",)]


def test_inner_order_limit_is_inner_scoped(graph):
    """ORDER BY/LIMIT inside the braces slice the INNER solutions
    before the join (SPARQL evaluates subqueries bottom-up)."""
    got = _run(
        graph,
        "SELECT ?s ?n { ?s p:name ?n "
        "{ SELECT ?n { ?x p:name ?n } ORDER BY ?n LIMIT 1 } }",
    )
    assert got == [("u:a", "Alice")]


def test_nested_subqueries(graph):
    got = _run(
        graph,
        "SELECT ?s { ?s p:name ?n { SELECT ?s { ?s p:knows ?o "
        "{ SELECT ?o { ?z p:knows ?o } } } } }",
    )
    assert got == [("u:a",), ("u:b",), ("u:c",)]


def test_subquery_as_only_group(graph):
    got = _run(graph, 'SELECT ?s { { SELECT ?s { ?s p:age "40" } } }')
    assert got == [("u:b",), ("u:c",)]


def test_outer_aggregate_over_subquery(graph):
    got = _run(
        graph,
        "SELECT (COUNT(*) AS ?c) { ?s p:name ?n "
        "{ SELECT ?s { ?s p:age ?a } } }",
    )
    assert got == [(3,)]


def test_subquery_select_star(graph):
    got = _run(
        graph,
        'SELECT ?s ?n { ?s p:name ?n { SELECT * { ?s p:age "30" } } }',
    )
    assert got == [("u:a", "Alice")]


def test_subquery_distinct(graph):
    got = _run(
        graph,
        "SELECT ?a { { SELECT DISTINCT ?a { ?x p:age ?a } } }",
    )
    assert got == [("30",), ("40",)]


def test_empty_inner_aggregate_divergence_pinned(graph):
    """Documented divergence: zero inner solutions make a no-GROUP-BY
    aggregate alias NULL; the SQL equi-join then drops all outer rows
    (SPARQL's compatibility join would keep them, the alias unbound).
    Pinned so nobody 'fixes' the useful join-on-MAX case away."""
    got = _run(
        graph,
        "SELECT ?s { ?s p:age ?m "
        "{ SELECT (MAX(?a) AS ?m) { ?x p:salary ?a } } }",
    )
    assert got == []


def test_join_on_optional_born_subquery_var_refused(graph):
    with pytest.raises(ValueError, match="possibly-unbound subquery"):
        select_text(
            graph,
            PRE + "SELECT ?s { ?s p:name ?o { SELECT ?s ?o "
            "{ ?s p:age ?a OPTIONAL { ?s p:nick ?o } } } }",
        ).collect()


def test_union_braces_still_parse(graph):
    got = _run(
        graph,
        "SELECT ?o { { u:a p:knows ?o } UNION { u:b p:knows ?o } }",
    )
    assert got == [("u:b",), ("u:c",)]


def test_unterminated_subquery_is_loud():
    with pytest.raises(SparqlSyntaxError):
        parse_select(PRE + "SELECT ?s { { SELECT ?s { ?s p:a ?o } }")


def test_trailing_junk_inside_subquery_braces_is_loud():
    with pytest.raises(SparqlSyntaxError):
        parse_select(
            PRE + "SELECT ?s { { SELECT ?s { ?s p:a ?o } LIMIT 2 junk } }"
        )
