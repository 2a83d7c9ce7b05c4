"""SPARQL 1.1 property paths (§9) over the serve algebra.

The reference's endpoint is Jena-backed, so its users can write paths
(Sparql.java:21-29 passes query text straight through); this engine
rewrites them into the existing algebra at parse time — sequences chain
fresh internal variables, inverse swaps the ends, alternation becomes a
UNION group — and quantified steps (``+ * ?``) evaluate as iterative
frontier closure (serve.path_closure), the same lineage-checkpointed
loop discipline as the sameAs connected-components operator.
"""

from __future__ import annotations

import pytest

from linkedspending_spark.sparql import (
    SparqlSyntaxError,
    parse_select,
    select_text,
)
from linkedspending_spark.serve import path_closure
from tools.plan_audit import plan_of

PRE = "PREFIX p: <p:> PREFIX u: <u:> "


@pytest.fixture(scope="module")
def graph(spark):
    """knows-edges a→b→c→d→b (a cycle through b,c,d) + two names."""
    XS = "http://www.w3.org/2001/XMLSchema#string"
    rows = [
        ("u:a", "p:knows", "u:b", "uri", None, None),
        ("u:b", "p:knows", "u:c", "uri", None, None),
        ("u:c", "p:knows", "u:d", "uri", None, None),
        ("u:d", "p:knows", "u:b", "uri", None, None),
        ("u:a", "p:name", "Alice", "literal", XS, None),
        ("u:b", "p:name", "Bob", "literal", XS, None),
        ("u:a", "p:likes", "u:c", "uri", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )


def _run(graph, q, **kw):
    return sorted(tuple(r) for r in select_text(graph, PRE + q, **kw).collect())


def test_sequence_keeps_multiplicity(graph):
    """?s knows/name ?n: the chain variable is projected away but its
    solution MULTIPLICITY stays (spec: fresh path variables are not
    in-scope yet duplicates remain) — Bob is reachable twice (a→b,
    d→b)."""
    got = _run(graph, 'SELECT ?n { ?s p:knows/p:name ?n }')
    assert got == [("Bob",), ("Bob",)]


def test_sequence_internal_var_invisible(graph):
    df = select_text(graph, PRE + "SELECT * { ?s p:knows/p:name ?n }")
    assert sorted(df.columns) == ["n", "s"]


def test_inverse(graph):
    assert _run(graph, "SELECT ?s { ?s ^p:knows u:c }") == [("u:d",)]


def test_alternation_is_union(graph):
    got = _run(graph, "SELECT DISTINCT ?o { u:a p:knows|p:likes ?o }")
    assert got == [("u:b",), ("u:c",)]


def test_plus_from_constant_terminates_on_cycle(graph):
    got = _run(graph, "SELECT ?o { u:a p:knows+ ?o }")
    assert got == [("u:b",), ("u:c",), ("u:d",)]


def test_star_adds_zero_length_to_constant(graph):
    got = _run(graph, "SELECT ?o { u:a p:knows* ?o }")
    assert got == [("u:a",), ("u:b",), ("u:c",), ("u:d",)]


def test_star_zero_length_matches_absent_constant(graph):
    """Spec: a zero-length path from a constant matches even when the
    term does not occur in the graph at all."""
    got = _run(graph, "SELECT ?o { u:zz p:knows* ?o }")
    assert got == [("u:zz",)]


def test_zero_or_one_from_constant(graph):
    got = _run(graph, "SELECT ?o { u:a p:knows? ?o }")
    assert got == [("u:a",), ("u:b",)]


def test_plus_var_var_is_pair_closure(graph):
    got = _run(graph, "SELECT ?s ?o { ?s p:knows+ ?o }")
    from_a = {(s, o) for s, o in got if s == "u:a"}
    assert from_a == {("u:a", "u:b"), ("u:a", "u:c"), ("u:a", "u:d")}
    assert len(got) == 12  # 3 (from a) + 3×3 (cycle nodes reach all 3)
    assert ("u:b", "u:b") in got  # cycle: b reaches itself in 3 hops


def test_star_var_var_includes_literal_identity(graph):
    """Zero-length paths pair every graph NODE with itself — including
    literal objects (the spec's ZeroLengthPath over graph terms)."""
    got = _run(graph, "SELECT ?s ?o { ?s p:knows* ?o }")
    assert ("Alice", "Alice") in got
    assert ("u:a", "u:a") in got
    assert len(got) == 15  # 12 closure pairs + identities for a/Alice/Bob


def test_plus_to_constant_reverse_bfs(graph):
    got = _run(graph, "SELECT ?s { ?s p:knows+ u:d }")
    assert got == [("u:a",), ("u:b",), ("u:c",), ("u:d",)]


def test_ask_both_constant_path(graph):
    assert _run(graph, "ASK { u:a p:knows+ u:d }") == [()]
    assert _run(graph, "ASK { u:d p:knows+ u:a }") == []


def test_same_var_closure_finds_cycle_members(graph):
    got = _run(graph, "SELECT ?x { ?x p:knows+ ?x }")
    assert got == [("u:b",), ("u:c",), ("u:d",)]


def test_path_joins_patterns_and_filters(graph):
    got = _run(
        graph,
        'SELECT ?s ?n { ?s p:knows+/p:name ?n FILTER(?n != "Bob") }',
    )
    assert got == []  # only Bob is reachable via knows+ then name
    got = _run(graph, "SELECT ?s ?n { ?s p:knows+/p:name ?n }")
    assert ("u:a", "Bob") in got and ("u:c", "Bob") in got


def test_construct_over_path(graph):
    got = _run(
        graph,
        "CONSTRUCT { ?s p:reaches ?o } WHERE "
        '{ ?s p:knows+ ?o . ?s p:name "Alice" }',
    )
    assert got == [
        ("u:a", "p:reaches", "u:b", "uri", None, None),
        ("u:a", "p:reaches", "u:c", "uri", None, None),
        ("u:a", "p:reaches", "u:d", "uri", None, None),
    ]


def test_with_kinds_types_path_bound_var(graph):
    df = select_text(
        graph,
        PRE + "SELECT ?o { u:a p:knows/p:name ?o }",
        with_kinds=True,
    )
    rows = df.collect()
    assert [r["o"] for r in rows] == ["Bob"]
    assert rows[0]["o__kind"] == "literal"
    assert rows[0]["o__datatype"].endswith("#string")


def test_count_star_counts_path_multiplicity(graph):
    got = _run(graph, "SELECT (COUNT(*) AS ?n) { ?s p:knows+ ?o }")
    assert got == [(12,)]


def test_path_paging(graph):
    got = _run(
        graph, "SELECT ?o { u:a p:knows+ ?o } ORDER BY ?o LIMIT 2 OFFSET 1"
    )
    assert got == [("u:c",), ("u:d",)]


def test_path_edge_scan_pushes_predicate(graph, tmp_path):
    """The path's edge scan reaches the parquet source with predicate
    AND seed as pushed filters. Asserted on the ``?`` form — the
    quantified loop's rounds read the same pushed-down scan, but its
    final plan is lineage-checkpointed (RDD scan), so the claim is
    only visible pre-checkpoint."""
    pq_dir = str(tmp_path / "graph")
    graph.write.parquet(pq_dir)
    pq = graph.sparkSession.read.parquet(pq_dir)
    plan = plan_of(path_closure(pq, "u:a", "p:knows", "?o", "?"))
    assert "PushedFilters" in plan
    assert "p:knows" in plan and "u:a" in plan


def test_not_converged_raises(graph):
    with pytest.raises(ValueError, match="did not converge"):
        path_closure(graph, "?s", "p:knows", "?o", "+", max_hops=1).collect()


@pytest.mark.parametrize(
    "q",
    [
        "SELECT ?s { ?s ?p+ ?o }",  # variable path element
        "SELECT ?s { ?s (p:a+/p:b)+ ?o }",  # nested quantifier
        "SELECT ?s { ?s (!p:a)+ ?o }",  # negated set quantified
        "SELECT ?s { u:a p:a|p:b u:b . ?s p:n ?o }",  # both-const alt
        "SELECT ?x { ?__pp1 p:a ?x }",  # reserved internal prefix
    ],
)
def test_refusals_are_loud(q):
    with pytest.raises(SparqlSyntaxError):
        parse_select(PRE + q)


def test_directly_nested_quantifiers_merge(graph):
    """Directly-nested quantifiers merge algebraically at parse time:
    equal pairs are idempotent ((p+)+ = p+), mixed pairs admit zero
    steps and unbounded repetition — exactly p* ((p+)* = (p?)+ = (p+)?
    = p*). The inverse of a closure normalizes too (^(p+) ≡ (^p)+).
    A quantifier buried inside a composite element ((p+/q)+) stays a
    loud refusal — that genuinely needs closure-within-closure."""
    star = _run(graph, "SELECT ?o { u:a p:knows* ?o }")
    plus = _run(graph, "SELECT ?o { u:a p:knows+ ?o }")
    assert _run(graph, "SELECT ?o { u:a (p:knows+)* ?o }") == star
    assert _run(graph, "SELECT ?o { u:a (p:knows+)? ?o }") == star
    assert _run(graph, "SELECT ?o { u:a (p:knows?)+ ?o }") == star
    assert _run(graph, "SELECT ?o { u:a (p:knows+)+ ?o }") == plus
    # inverse of a closure: ?s such that u:a knows+ ?s
    assert _run(graph, "SELECT ?s { ?s ^(p:knows+) u:a }") == [
        ("u:b",), ("u:c",), ("u:d",)
    ]
    # nested quantifier over a COMPOSITE element merges the same way
    two_star = _run(graph, "SELECT ?o { u:a (p:knows/p:knows)* ?o }")
    assert (
        _run(graph, "SELECT ?o { u:a ((p:knows/p:knows)+)* ?o }")
        == two_star
    )


def test_quantified_paths_inside_minus_and_exists(graph):
    """Quantified/alternation paths work inside MINUS and FILTER
    [NOT] EXISTS bodies — the nested-body machinery evaluates them
    bottom-up (b and d sit on the knows-cycle and reach ?x via
    knows+; a does too; only subjects with names appear)."""
    got = _run(
        graph,
        "SELECT ?n { ?s p:name ?n "
        "FILTER EXISTS { ?s p:knows+ ?x } }",
    )
    assert got == [("Alice",), ("Bob",)]
    got = _run(
        graph,
        "SELECT ?n { ?s p:name ?n MINUS { ?s p:knows+ ?x } }",
    )
    assert got == []  # both named nodes reach something
    got = _run(
        graph,
        "SELECT ?n { ?s p:name ?n "
        "MINUS { ?s p:likes|p:missing ?x } }",
    )
    assert got == [("Bob",)]  # only alice likes


def test_sequence_inside_optional_is_allowed(graph):
    """Sequences/inverses rewrite to plain patterns, so they stay legal
    inside OPTIONAL/UNION — only alternation/quantifiers are group-level."""
    got = _run(
        graph,
        "SELECT ?s ?n { ?s p:name ?n "
        "OPTIONAL { ?s p:knows/p:name ?o } }",
    )
    assert len(got) == 2


def test_quantified_path_inside_optional(graph):
    """A quantified path inside OPTIONAL makes the body a nested-
    algebra group: the closure evaluates inside it and LEFT-joins the
    outer solution (Bob has no p:likes chain → NULL-extended)."""
    got = _run(
        graph,
        "SELECT ?n ?o { ?s p:name ?n OPTIONAL { ?s p:likes+ ?o } }",
    )
    assert got == [("Alice", "u:c"), ("Bob", None)]


def test_quantified_composite_sequence(graph):
    """(p/q)+ iterates the closure over a JOIN-built step relation:
    (knows/knows)+ from u:a reaches exactly the even-hop nodes of the
    a→b→c→d→b cycle."""
    got = _run(graph, "SELECT ?o { u:a (p:knows/p:knows)+ ?o }")
    assert got == [("u:b",), ("u:c",), ("u:d",)]
    # reversed: everything reaches u:b in some even hop count here
    got = _run(graph, "SELECT ?x { ?x (p:knows/p:knows)+ u:b }")
    assert got == [("u:a",), ("u:b",), ("u:c",), ("u:d",)]
    # zero-or-one: the seed itself plus one double-hop
    got = _run(graph, "SELECT ?o { u:a (p:knows/p:knows)? ?o }")
    assert got == [("u:a",), ("u:c",)]


def test_quantified_composite_alternation(graph):
    """(p|q)+ unions the step scans before closing."""
    got = _run(graph, "SELECT ?o { u:a (p:likes|p:knows)+ ?o }")
    assert got == [("u:b",), ("u:c",), ("u:d",)]


def test_quantifier_inside_alternation(graph):
    """p+|q: branches with a quantified member become nested group
    specs (union-by-name); a branch may also feed an enclosing
    sequence chain through its reserved variable."""
    got = _run(graph, "SELECT ?o { u:a p:likes+|p:name ?o }")
    assert got == [("Alice",), ("u:c",)]
    got = _run(graph, "SELECT ?n { u:a (p:likes+|p:knows)/p:name ?n }")
    assert got == [("Bob",)]


def test_alternation_inside_union_branch(graph):
    """Alternation inside a UNION branch: the branch becomes its own
    nested group (its inner UNION evaluates bottom-up)."""
    got = _run(
        graph,
        "SELECT ?o { { u:a p:likes|p:name ?o } UNION { u:b p:name ?o } }",
    )
    assert got == [("Alice",), ("Bob",), ("u:c",)]


# -- blank-node syntax (desugars to the same reserved existentials) ---------


def test_blank_node_object_plist(graph):
    got = _run(graph, 'SELECT ?s { ?s p:knows [ p:name "Bob" ] }')
    assert got == [("u:a",), ("u:d",)]


def test_blank_node_subject_bare_statement(graph):
    got = _run(graph, 'SELECT ?n { [ p:name ?n ; p:knows ?o ] }')
    assert got == [("Alice",), ("Bob",)]


def test_blank_node_subject_with_outer_plist(graph):
    got = _run(graph, "SELECT ?n { [ p:knows u:c ] p:name ?n }")
    assert got == [("Bob",)]


def test_labeled_blank_nodes_corefer(graph):
    got = _run(graph, 'SELECT ?n { _:x p:name ?n . _:x p:knows u:c }')
    assert got == [("Bob",)]


def test_blank_vars_never_projected(graph):
    df = select_text(graph, PRE + "SELECT * { ?s p:knows [ p:name ?n ] }")
    assert sorted(df.columns) == ["n", "s"]


def test_anonymous_empty_subject(graph):
    got = _run(graph, "SELECT DISTINCT ?n { [] p:name ?n }")
    assert got == [("Alice",), ("Bob",)]


def test_nested_blank_nodes(graph):
    # [p:name "Bob"] = u:b; X knows u:b -> X in {a, d}; ?s knows X -> c
    got = _run(
        graph, 'SELECT ?s { ?s p:knows [ p:knows [ p:name "Bob" ] ] }'
    )
    assert got == [("u:c",)]


def test_path_inside_blank_node_plist(graph):
    got = _run(graph, 'SELECT ?s { ?s p:knows [ p:knows/p:name "Bob" ] }')
    assert got == [("u:c",)]


def test_unterminated_blank_node_is_loud():
    with pytest.raises(SparqlSyntaxError, match="expected ']'"):
        parse_select(PRE + "SELECT ?s { ?s p:knows [ p:name ?n }")


# -- negated property sets ---------------------------------------------------


def test_nps_single(graph):
    got = _run(graph, "SELECT ?o { u:a !p:knows ?o }")
    assert got == [("Alice",), ("u:c",)]  # name + likes edges


def test_nps_set(graph):
    got = _run(graph, "SELECT ?o { u:a !(p:knows|p:likes) ?o }")
    assert got == [("Alice",)]


def test_nps_in_sequence(graph):
    # u:a -!knows-> {Alice, u:c}; u:c -knows-> u:d
    got = _run(graph, "SELECT ?o { u:a !p:knows/p:knows ?o }")
    assert got == [("u:d",)]


def test_nps_pushes_not_in(graph, tmp_path):
    pq_dir = str(tmp_path / "nps")
    graph.write.parquet(pq_dir)
    pq = graph.sparkSession.read.parquet(pq_dir)
    plan = plan_of(select_text(pq, PRE + "SELECT ?o { u:a !p:knows ?o }"))
    assert "PushedFilters" in plan and "Not" in plan and "knows" in plan


@pytest.mark.parametrize(
    "q",
    [
        "SELECT ?o { u:a ^!p:knows ?o }",
        "SELECT ?o { u:a !(^p:knows) ?o }",
        "SELECT ?o { u:a !p:knows+ ?o }",
        'SELECT ?o { u:a !(p:a|"x") ?o }',
    ],
)
def test_nps_refusals(q):
    with pytest.raises(SparqlSyntaxError):
        parse_select(PRE + q)
