"""Property tests for the dedup operators on constructed corpora where
ground truth is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nomba_data_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)


@pytest.fixture
def corpus(spark):
    """10 docs: 0/1 identical; 2 = 1 with punctuation/case noise
    (normalizes identical); 3 = near-dup of 1 (one word of 42 changed,
    shingle-Jaccard ~0.85 so 4x4-band LSH catches it reliably);
    4..9 pairwise-disjoint word sets (true non-duplicates)."""
    base = " ".join(f"w{i}a w{i}b w{i}c" for i in range(14))  # 42 distinct tokens
    near = base.replace("w7b", "CHANGED")
    rows = [
        (0, base),
        (1, base),
        (2, base.upper() + "!!!"),
        (3, near),
    ] + [
        (i, " ".join(f"doc{i}tok{j}" for j in range(15)))
        for i in range(4, 10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_normalized_identity(spark, corpus):
    groups = {r.keeper_id: r.group_size for r in exact_dedup_groups(corpus).collect()}
    # 0,1,2 collapse to one group under normalization; others singletons
    assert groups[0] == 3
    assert all(v == 1 for k, v in groups.items() if k != 0)


def test_minhash_candidates_cover_true_near_dups(spark, corpus):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(corpus).collect()}
    # the identical triple must all pair up
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    # the near-dup (J ~0.85) lands in a shared band (deterministic for
    # the fixed hash family + this corpus)
    assert (0, 3) in pairs and (1, 3) in pairs
    # disjoint-vocabulary docs never pair with anything
    assert not any(a >= 4 or b >= 4 for a, b in pairs)


def test_jaccard_exact_on_known_overlap(spark, corpus):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(corpus, 0.1).collect()}
    assert pairs[(0, 1)] == 1.0  # identical
    assert pairs[(0, 2)] == 1.0  # identical after normalization
    assert 0.7 < pairs[(0, 3)] < 1.0  # near-dup strictly between


def test_simhash_distance_orders_by_similarity(spark, corpus):
    sh = {r.doc_id: r.simhash for r in simhash(corpus).collect()}
    ham = lambda a, b: bin(sh[a] ^ sh[b]).count("1")  # noqa: E731
    assert ham(0, 1) == 0 and ham(0, 2) == 0  # identical text, identical signature
    assert ham(0, 3) < ham(0, 4)  # near-dup closer than unrelated


def test_connected_components_chain_clique_singleton(spark):
    """Min-label propagation: a 4-chain collapses to its min id (the
    diameter case), a clique converges in one round, and the canonical
    assignment marks exactly one doc per component plus all untouched
    singletons."""
    from nomba_data_pipeline_spark.operators.components import (
        canonical_assignment,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)],
        "doc_a long, doc_b long",
    )
    comp = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

    docs = spark.range(1, 15).withColumnRenamed("id", "doc_id")
    out = canonical_assignment(docs, pairs).collect()
    canon = sorted(r["doc_id"] for r in out if r["is_canonical"])
    # one canonical per component + singletons 5..9, 13, 14
    assert canon == [1, 5, 6, 7, 8, 9, 10, 13, 14]
    by_id = {r["doc_id"]: r["comp"] for r in out}
    assert by_id[4] == 1 and by_id[12] == 10 and by_id[7] == 7


def test_connected_components_convergence_guard(spark):
    import pytest as _pytest

    from nomba_data_pipeline_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
