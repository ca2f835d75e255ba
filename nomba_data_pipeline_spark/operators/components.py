"""Connected components over a pair graph — dedup cluster assignment.

Every near-duplicate detector in this engine (MinHash/LSH, SimHash,
n-gram Jaccard, embedding cosine) emits PAIRS; an actual dedup job
needs each document's CLUSTER so it can keep one canonical row per
cluster. Pairs→clusters is connected components: transitively linked
docs share a cluster id (the minimum doc id in the component — stable,
content-addressed, no uid generation).

Algorithm: min-label propagation. Each node starts labeled with
itself; every round each node takes the min of its own label and its
neighbors' labels; convergence when no label changes. Rounds needed =
graph diameter — for near-dup clusters (tight cliques plus short
chains) that is small and bounded in practice; each round is one join
+ one groupBy-min, all DataFrame ops, nothing driver-side but the
loop counter and a change COUNT (a scalar). Lineage is truncated per
round with localCheckpoint, or the plan would double every iteration.

At 100 TB: propagation cost is rounds × (one shuffle of the edge list
+ one of the label table). For adversarial long-chain graphs use the
large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14), which converges in
O(log n) rounds with the same join/agg primitives — near-dup graphs
don't need it (their diameter is set by shingle overlap, not corpus
size), so this implementation keeps the simpler invariant-checkable
form with `max_iter` as the guard rail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, comp) for every node appearing in `pairs`, where
    comp = min node id reachable through the undirected pair graph.
    Raises if propagation hasn't converged within `max_iter` rounds
    (a correctness guard — an unconverged labeling silently merges or
    splits clusters)."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nb = (
            und.join(labels, und["b"] == labels["node"])
            .select(und["a"].alias("node"), F.col("comp").alias("nb_comp"))
            .groupBy("node")
            .agg(F.min("nb_comp").alias("nb_comp"))
        )
        new_labels = (
            labels.join(nb, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nb_comp", F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds the guard; raise max_iter or switch to "
        "large-star/small-star for long-chain graphs"
    )


def canonical_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Full-corpus dedup verdict: (doc_id, comp, is_canonical) for EVERY
    document — paired docs get their component's min id, untouched docs
    are their own singleton component, and exactly one doc per
    component (the min) is flagged canonical. `docs.filter(is_canonical)`
    is the deduplicated corpus; one broadcast-friendly left join since
    the label table is bounded by the number of PAIRED docs, which
    near-dup detection keeps far below the corpus size."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("comp"),
        )
        .withColumn("is_canonical", F.col("comp") == F.col(id_col))
    )
