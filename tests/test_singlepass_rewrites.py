"""Round-16 single-pass rewrites: the aggregate form of the Q21-shape
row must equal its EXISTS/NOT EXISTS reference exactly, and the
text-family rows rewritten to share one tokenize pass (lazy checkpoint
/ map-side array stats) must keep reading the corpus at most once.

Value parity for every rewritten row is additionally covered by the
DuckDB mirror (test_queries_vs_duckdb) — the oracle SQL kept the
original multi-pass forms, so the mirror IS the old-vs-new check."""

from nomba_data_pipeline_spark.catalog import load_table
from nomba_data_pipeline_spark.plans.queries import REGISTRY
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_waiting_suppliers_aggregate_form_matches_exists_form(spark):
    """The per-order aggregate rewrite must reproduce the EXISTS /
    NOT EXISTS semantics row-for-row (the pre-r16 implementation,
    inlined here as the reference), and the plan must read lineitem
    ONCE with no semi/anti self-joins — the optimization IS the two
    deleted lineitem-sized exchanges."""
    from nomba_data_pipeline_spark.catalog import register_views

    register_views(spark, SF_SMALL, ("lineitem", "orders", "supplier"))
    ref = spark.sql(
        """
        WITH flagged AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT s.s_name AS supplier, count(*) AS numwait
        FROM flagged f1
        JOIN supplier s ON f1.l_suppkey = s.s_suppkey
        WHERE f1.late = 1
          AND EXISTS (
              SELECT 1 FROM flagged f2
              WHERE f2.l_orderkey = f1.l_orderkey
                AND f2.l_suppkey <> f1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM flagged f3
              WHERE f3.l_orderkey = f1.l_orderkey
                AND f3.l_suppkey <> f1.l_suppkey
                AND f3.late = 1)
        GROUP BY 1
        """
    )
    new = REGISTRY["waiting_suppliers"].fn(spark, SF_SMALL)
    assert new.columns == ref.columns
    # name + type parity; nullability legitimately differs (count(*) is
    # non-nullable, the sum over the aggregated form is nullable) and
    # is invisible to the driver's pandas-level gate
    assert [(f.name, f.dataType) for f in new.schema.fields] == [
        (f.name, f.dataType) for f in ref.schema.fields
    ]
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0
    assert new.count() > 0  # non-vacuous at sf0.001
    plan = _plan(new)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_precedence_dedup_single_pass_matches_join_form(spark):
    """precedence_dedup computes winner + group stats as windows over
    ONE fp-keyed exchange; pin exact equality against the old
    winners-join-groups reference (which evaluated the scan+fingerprint
    subtree once per branch) and the plan floor: 3 document scans (the
    union's by-design slices), 1 exchange, no join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nomba_data_pipeline_spark.operators.dedup import (
        fingerprint,
        precedence_dedup,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    base = docs.select("doc_id", "source", F.lit(2).alias("prio"), "text")
    curated = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("curated").alias("source"),
        F.lit(0).alias("prio"),
        "text",
    )
    merged = base.unionByName(curated)

    new = precedence_dedup(merged)
    withfp = merged.select(
        "doc_id", "source", "prio", fingerprint("text").alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("prio", "doc_id")
    winners = (
        withfp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "fp",
            F.col("doc_id").alias("keeper_id"),
            F.col("source").alias("keeper_source"),
            F.col("prio").alias("keeper_prio"),
        )
    )
    groups = withfp.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("source").alias("n_sources"),
    )
    ref = winners.join(groups, "fp").filter(F.col("n_copies") > 1)
    assert new.columns == ref.columns
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0
    assert new.count() > 0  # the curated mirror guarantees dup groups
    plan = _plan(new)
    assert plan.count("documents.parquet") == 2, plan  # 2 union slices here
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_dominant_part_suppliers_scans_fact_once(spark):
    """The per-part max is a window over the pair-grain aggregate, not
    a second aggregate joined back — lineitem must appear in the plan
    exactly once (the join form re-ran the fact join+agg per branch)."""
    plan = _plan(REGISTRY["dominant_part_suppliers"].fn(spark, SF_SMALL))
    assert plan.count("lineitem.parquet") == 1, plan


def test_corpus_datacard_three_corpus_passes(spark):
    """total_tokens rides the same global aggregate as counts and the
    percentile — the datacard reads the corpus exactly three times (the
    two remaining legs need different grouping keys), not four."""
    plan = _plan(REGISTRY["corpus_datacard"].fn(spark, SF_SMALL))
    assert plan.count("documents.parquet") == 3, plan


def test_min_price_supplier_scans_fact_once(spark):
    """The Q2 correlated-subquery min is a window over the brand-pruned
    join — lineitem appears once and no sort-merge join-back exists
    (the decorrelated form aggregated the UNPRUNED fact a second
    time)."""
    plan = _plan(REGISTRY["min_price_supplier"].fn(spark, SF_SMALL))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_single_tokenize_rows_read_corpus_at_most_once(spark):
    """Each rewritten text row's physical plan references the documents
    scan at most once: the checkpointed rows read the corpus zero times
    after the checkpoint boundary (every branch consumes the
    materialized frame), and the map-side rows exactly once. Before the
    rewrite these plans re-tokenized the corpus 2-3x (one scan per
    branch — plans/r16/*_before.txt)."""
    rows = {
        # row -> max allowed "documents.parquet" scan mentions
        # (vocab_coverage deliberately absent: its checkpoint form was
        # A/B'd 0.78x and rejected — plans/r16/ab_s4_rewrites.json)
        "unigram_logppl": 0,
        "bigram_pmi": 0,
        "cross_doc_repeated_spans": 0,
        "bm25_search": 0,
        "token_budget_select_scalable": 0,
        "curriculum_sample": 1,
    }
    for name, max_scans in rows.items():
        plan = _plan(REGISTRY[name].fn(spark, SF_SMALL))
        got = plan.count("documents.parquet")
        assert got <= max_scans, f"{name}: {got} corpus scans\n{plan}"
