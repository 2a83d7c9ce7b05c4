"""Dedup suite + similarity search: LSH/SimHash recall vs exact oracles."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

import pytest

from linkedspending_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    hamming_pairs_from_fingerprints,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from linkedspending_spark.operators.simsearch import build_ivf, cosine_topk, ivf_topk

_WORDS = "the quick brown fox jumps over lazy dog spark triple graph data cube".split()


def _mk_docs(n=60, seed=4, dup_every=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if i % dup_every == 3 and i > 0:
            base = docs[i - 3][1].split()
            j = rng.randrange(len(base))
            base[j] = rng.choice(_WORDS)  # near-dup: one token changed
            text = " ".join(base)
        else:
            text = " ".join(rng.choice(_WORDS) for _ in range(30))
        docs.append((i, text))
    # exact dups
    docs.append((n, docs[0][1]))
    docs.append((n + 1, docs[1][1]))
    return docs


def test_exact_dedup(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = exact_dedup(df)
    assert kept.count() == len({t for _, t in docs})
    # representative is the min doc_id
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in kept_ids and 60 not in kept_ids


def test_minhash_lsh_recall_vs_exact(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(df, threshold=0.7).collect()
    }
    lsh = {
        (r["a"], r["b"]) for r in minhash_lsh_pairs(df, threshold=0.7).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    # LSH precision is exact (verified), recall should be high
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_simhash_pairs_find_near_dups(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(df, max_hamming=12).collect()}
    # exact dups must be found at hamming 0
    assert pairs.get((0, 60)) == 0
    assert pairs.get((1, 61)) == 0


def test_hamming_banding_pigeonhole_complete(spark):
    """The round-2 footgun: defaults (max_hamming=8, 4 chunks) silently
    lost pairs differing in every chunk. Derived bands must find a pair
    at hamming 4 that differs in all four old 16-bit chunks, under the
    DEFAULT parameters."""
    base = 0x0123456789ABCDEF
    # one flipped bit inside each of the old four 16-bit chunks
    flipped = base ^ ((1 << 0) | (1 << 17) | (1 << 34) | (1 << 51))
    # negative fingerprints (bit 63 set) exercise the unmasked top chunk
    fp = spark.createDataFrame(
        [(1, base), (2, flipped), (3, -1), (4, -2)], "k long, fp long"
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in hamming_pairs_from_fingerprints(fp, max_hamming=8).collect()
    }
    assert got[(1, 2)] == 4
    assert got[(3, 4)] == 1


def test_hamming_banding_rejects_unsafe_params(spark):
    fp = spark.createDataFrame([(1, 0)], "k long, fp long")
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_pairs_from_fingerprints(fp, max_hamming=8, prefix_bands=4)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(
            spark.createDataFrame([(1, "a")], "doc_id long, text string"),
            max_hamming=4,
            prefix_bands=4,
        )


def _mk_vecs(n=80, d=16, seed=6):
    rng = random.Random(seed)
    vecs = []
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(d)]
        vecs.append((i, v))
    # planted near-dup of vector 0
    v0 = vecs[0][1]
    vecs.append((n, [x + rng.gauss(0, 0.01) for x in v0]))
    return vecs


def test_embedding_near_dup(spark):
    vecs = _mk_vecs()
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, threshold=0.98).collect()}
    assert (0, 80) in pairs


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_cosine_topk_exact(spark):
    vecs = _mk_vecs()
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = vecs[0][1]
    got = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    want = sorted(
        vecs, key=lambda kv: (-_cosine(kv[1], q), kv[0])
    )[:5]
    assert got == [k for k, _ in want]
    assert got[0] == 0 and got[1] == 80  # self, then planted near-dup


def test_ivf_topk_contains_true_neighbors(spark):
    vecs = _mk_vecs(n=120)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = vecs[0][1]
    assigned, centroids = build_ivf(spark, df, n_cells=8, iters=2)
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    approx = [r["vec_id"] for r in ivf_topk(assigned, centroids, q, k=5, n_probe=4).collect()]
    # recall@5 with half the cells probed should catch most true neighbors
    assert len(set(exact) & set(approx)) >= 3
    # the planted near-dup lands in the query's own cell → always found
    assert 120 in approx
