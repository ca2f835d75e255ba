"""Round-16 single-pass rewrites: the aggregate form of the Q21-shape
row must equal its EXISTS/NOT EXISTS reference exactly, and the
text-family rows rewritten to share one tokenize pass (lazy checkpoint
/ map-side array stats) must keep reading the corpus at most once.

Value parity for every rewritten row is additionally covered by the
DuckDB mirror (test_queries_vs_duckdb) — the oracle SQL kept the
original multi-pass forms, so the mirror IS the old-vs-new check."""

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
