"""Tests for canonicalization (connected components) and similarity linking."""

from __future__ import annotations

import random

from linkedspending_spark.operators.canon import (
    canonicalize_triples,
    connected_components,
    exact_dictionary_links,
    sameas_closure_within_group,
)
from linkedspending_spark.operators.linking import (
    minhash_lsh_join,
    trigram_similarity_join,
)


def _union_find_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_connected_components_random_graph(spark):
    rng = random.Random(13)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [
        (nodes[rng.randrange(len(nodes))], nodes[rng.randrange(len(nodes))])
        for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _union_find_components(edges)
    df = spark.createDataFrame(edges, "src string, dst string")
    # default: small-graph driver union-find fast path
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == expected
    # forced distributed star loop: identical result
    got_dist = {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got_dist == expected


def test_connected_components_chain_and_star(spark):
    # a long chain (worst case for naive propagation) + a star
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(30)]
    star = [("hub", f"s{i}") for i in range(20)]
    df = spark.createDataFrame(chain + star, "src string, dst string")
    # the long chain exercises the distributed loop's O(log n) rounds
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert all(got[f"c{i:02d}"] == "c00" for i in range(31))
    assert all(got[f"s{i}"] == "hub" for i in range(20)) and got["hub"] == "hub"


def test_exact_dictionary_links_and_closure(spark):
    labels = spark.createDataFrame(
        [("http://x/1", "Japan"), ("http://x/2", "JAPAN "), ("http://x/3", "Peru")],
        "uri string, label string",
    )
    dictionary = spark.createDataFrame(
        [("japan", "http://dbp/Japan")], "label string, uri string"
    )
    links = exact_dictionary_links(labels, dictionary).collect()
    assert {(r["s"], r["o"]) for r in links} == {("http://x/1", "http://dbp/Japan")}

    grp = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "d")], "g string, uri string"
    )
    pairs = {(r["s"], r["o"]) for r in sameas_closure_within_group(grp, "g", "uri").collect()}
    assert pairs == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b")}


def test_canonicalize_triples(spark):
    triples = spark.createDataFrame(
        [
            ("http://x/dup", "p1", "http://x/other", "uri", None, None),
            ("http://x/keep", "p2", "http://x/dup", "uri", None, None),
            ("http://x/keep", "p3", "http://x/dup", "literal", None, None),
        ],
        "s string, p string, o string, o_kind string, o_datatype string, o_lang string",
    )
    comp = spark.createDataFrame(
        [("http://x/dup", "http://x/canon")], "node string, component string"
    )
    got = {(r["s"], r["p"], r["o"]) for r in canonicalize_triples(triples, comp).collect()}
    assert got == {
        ("http://x/canon", "p1", "http://x/other"),
        ("http://x/keep", "p2", "http://x/canon"),
        ("http://x/keep", "p3", "http://x/dup"),  # literal object untouched
    }


_LEFT = [
    ("l1", "japan"),
    ("l2", "german federal budget"),
    ("l3", "xyzzy"),
]
_RIGHT = [
    ("r1", "japan"),
    ("r2", "germany federal budget"),
    ("r3", "peru"),
]


def test_trigram_similarity_join(spark):
    left = spark.createDataFrame(_LEFT, "lid string, label string")
    right = spark.createDataFrame(_RIGHT, "rid string, label string")
    got = trigram_similarity_join(left, right, "lid", "label", "rid", "label", 0.5)
    pairs = {(r["lid"], r["rid"]): r["sim"] for r in got.collect()}
    assert ("l1", "r1") in pairs and pairs[("l1", "r1")] == 1.0
    assert ("l2", "r2") in pairs and 0.5 <= pairs[("l2", "r2")] < 1.0
    assert not any(k for k in pairs if k[0] == "l3")


def test_minhash_lsh_matches_exact_on_identical(spark):
    left = spark.createDataFrame(_LEFT, "lid string, label string")
    right = spark.createDataFrame(_RIGHT, "rid string, label string")
    got = minhash_lsh_join(left, right, "lid", "label", "rid", "label", 0.5)
    pairs = {(r["lid"], r["rid"]) for r in got.collect()}
    # identical strings always collide in every band → must be found
    assert ("l1", "r1") in pairs
    # high-sim pair should usually be found; verify scores are exact Jaccard
    exact = {
        (r["lid"], r["rid"]): r["sim"]
        for r in trigram_similarity_join(
            left, right, "lid", "label", "rid", "label", 0.5
        ).collect()
    }
    for r in got.collect():
        assert abs(exact.get((r["lid"], r["rid"]), -1) - r["sim"]) < 1e-9


def test_lsh_join_recall_vs_exact_ground_truth(spark):
    """J5 scale path quality bound (round-1 VERDICT item 2b): on the
    part-name link task the banded-LSH join must be a SUBSET of the
    exact trigram join (precision 1.0 — candidates are exact-verified)
    with recall ≥ 0.9 at threshold 0.5 (measured 0.98)."""
    from pyspark.sql import functions as F

    # sf0.01: the smallest scale where both key halves are populated
    p = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    left = p.where(F.col("p_partkey") < 1000).select(
        F.col("p_partkey").alias("pk"), F.lower(F.col("p_name")).alias("pname")
    )
    right = p.where(F.col("p_partkey") >= 1000).select(
        F.col("p_partkey").alias("qk"), F.lower(F.col("p_name")).alias("qname")
    )
    exact = {
        (r["pk"], r["qk"])
        for r in trigram_similarity_join(
            left, right, "pk", "pname", "qk", "qname", threshold=0.5
        ).collect()
    }
    lsh = {
        (r["pk"], r["qk"])
        for r in minhash_lsh_join(
            left, right, "pk", "pname", "qk", "qname",
            threshold=0.5, n_hashes=16, bands=8,
        ).collect()
    }
    assert lsh <= exact  # exact-verify step ⇒ no false positives
    assert len(lsh & exact) / len(exact) >= 0.9


def test_merge_components_equals_full_recompute(spark):
    """Incremental CC contract: merge_components(CC(wave1), wave2) ==
    connected_components(wave1 ∪ wave2), including brand-new nodes."""
    from linkedspending_spark.operators.canon import merge_components

    rng = random.Random(29)
    nodes = [f"m{i:03d}" for i in range(100)]
    all_edges = [
        (nodes[rng.randrange(len(nodes))], nodes[rng.randrange(len(nodes))])
        for _ in range(130)
    ]
    all_edges = [(u, v) for u, v in all_edges if u != v]
    wave1, wave2 = all_edges[:70], all_edges[70:]
    # wave2 also introduces nodes the first wave never saw
    wave2 += [("zz-new-1", nodes[0]), ("zz-new-1", "zz-new-2"), ("aa-new", nodes[50])]

    base = connected_components(
        spark.createDataFrame(wave1, "src string, dst string")
    )
    merged = merge_components(
        base, spark.createDataFrame(wave2, "src string, dst string")
    )
    got = {r["node"]: r["component"] for r in merged.collect()}

    expected = _union_find_components(wave1 + wave2)
    # merge_components covers nodes of both waves; full CC covers the same
    assert got == expected
    # every node exactly once
    assert merged.count() == len(got)


def test_merge_components_intra_component_wave_is_noop(spark):
    from linkedspending_spark.operators.canon import merge_components

    base_edges = [("a", "b"), ("b", "c"), ("x", "y")]
    base = connected_components(
        spark.createDataFrame(base_edges, "src string, dst string")
    )
    # edges entirely inside existing components: nothing changes
    wave = spark.createDataFrame([("a", "c"), ("y", "x")], "src string, dst string")
    assert merge_components(base, wave, changed_only=True).count() == 0
    full = {r["node"]: r["component"]
            for r in merge_components(base, wave).collect()}
    assert full == {r["node"]: r["component"] for r in base.collect()}


def test_merge_components_changed_only_is_the_increment(spark):
    """changed_only=True returns exactly the rows a MERGE sink must
    upsert: applying it over the old map reproduces the full result."""
    from linkedspending_spark.operators.canon import merge_components

    base_edges = [("a", "b"), ("p", "q"), ("x", "y")]
    base = connected_components(
        spark.createDataFrame(base_edges, "src string, dst string")
    )
    # bridge two components and attach one new node (named to sort
    # AFTER x/y — a lexicographically smaller new node would correctly
    # re-label the whole component to itself, min-node contract)
    wave = spark.createDataFrame(
        [("b", "q"), ("zz-new", "y")], "src string, dst string"
    )
    inc = {r["node"]: r["component"]
           for r in merge_components(base, wave, changed_only=True).collect()}
    full = {r["node"]: r["component"]
            for r in merge_components(base, wave).collect()}
    old = {r["node"]: r["component"] for r in base.collect()}
    applied = {**old, **inc}
    assert applied == full
    # p,q moved under 'a'; zz-new joined x/y's component; a,b,x,y unchanged
    assert inc["p"] == "a" and inc["q"] == "a" and inc["zz-new"] == "x"
    assert not {"a", "b", "x", "y"} & set(inc)


def test_merge_components_chained_waves(spark):
    from linkedspending_spark.operators.canon import merge_components

    rng = random.Random(31)
    nodes = [f"c{i:02d}" for i in range(40)]
    edges = [
        (nodes[rng.randrange(len(nodes))], nodes[rng.randrange(len(nodes))])
        for _ in range(60)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    w1, w2, w3 = edges[:20], edges[20:40], edges[40:]
    cur = connected_components(
        spark.createDataFrame(w1, "src string, dst string")
    )
    for w in (w2, w3):
        cur = merge_components(
            cur, spark.createDataFrame(w, "src string, dst string")
        )
    got = {r["node"]: r["component"] for r in cur.collect()}
    assert got == _union_find_components(edges)


def test_incremental_canonicalization_composes(spark):
    """The full incremental loop: triples canonicalized against CC(E1),
    then a new wave E2 folded with merge_components and applied with
    canonicalize_triples_minimal_dedup(increment), must equal one-shot
    canonicalization against CC(E1 ∪ E2) with statement-set semantics —
    including a node that appears in triples and E2 but never in E1."""
    import random

    from linkedspending_spark.operators.canon import (
        canonicalize_triples_minimal_dedup,
        merge_components,
    )

    rng = random.Random(37)
    nodes = [f"http://x/n{i:02d}" for i in range(24)]
    rows = []
    for i in range(120):
        s = nodes[rng.randrange(len(nodes))]
        o = nodes[rng.randrange(len(nodes))]
        kind = "uri" if rng.random() < 0.7 else "literal"
        rows.append((s, f"p{rng.randrange(4)}", o, kind, None, None))
    schema = (
        "s string, p string, o string, o_kind string,"
        " o_datatype string, o_lang string"
    )
    triples = spark.createDataFrame(sorted(set(rows)), schema)

    e1 = [(nodes[rng.randrange(18)], nodes[rng.randrange(18)]) for _ in range(10)]
    # wave 2 touches nodes 18-23, which E1 never saw (but triples use)
    e2 = [(nodes[rng.randrange(len(nodes))], nodes[rng.randrange(len(nodes))])
          for _ in range(8)]
    e1 = [(u, v) for u, v in e1 if u != v]
    e2 = [(u, v) for u, v in e2 if u != v]

    c1 = connected_components(spark.createDataFrame(e1, "src string, dst string"))
    canon1 = canonicalize_triples_minimal_dedup(
        triples, c1
    )

    inc = merge_components(
        c1, spark.createDataFrame(e2, "src string, dst string"),
        changed_only=True,
    )
    got = {
        (r["s"], r["p"], r["o"])
        for r in canonicalize_triples_minimal_dedup(canon1, inc).collect()
    }

    full = connected_components(
        spark.createDataFrame(e1 + e2, "src string, dst string")
    )
    want = {
        (r["s"], r["p"], r["o"])
        for r in canonicalize_triples_minimal_dedup(triples, full).collect()
    }
    assert got == want
    # and the bag is a set on both sides (statement-set semantics held)
    inc_df = canonicalize_triples_minimal_dedup(canon1, inc)
    assert inc_df.count() == inc_df.dropDuplicates(["s", "p", "o"]).count()


def test_merge_components_distributed_delta_path(spark):
    """local_threshold=0 forces the star-loop CC over the component-level
    edge list — the 100-TB path — with identical results."""
    from linkedspending_spark.operators.canon import merge_components

    base = connected_components(
        spark.createDataFrame([("a", "b"), ("p", "q")], "src string, dst string")
    )
    wave = spark.createDataFrame([("b", "q"), ("q", "zz")], "src string, dst string")
    got = {
        r["node"]: r["component"]
        for r in merge_components(base, wave, local_threshold=0).collect()
    }
    assert got == {"a": "a", "b": "a", "p": "a", "q": "a", "zz": "a"}
