"""Similarity-search quality tests: ANN variants measured against the
exact brute-force operator (recall@k), empty-input robustness."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomba_data_pipeline_spark.catalog import load_table
from nomba_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_expr,
    cosine_topk_ivf,
)
from tests.conftest import SF_SMALL


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_vectorized_matches_expression_exactly(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qf = F.col("vec_id") % 50 == 0
    vec = {(r.query_id, r.rank): r.neighbor_id for r in cosine_topk(emb, qf, k=5).collect()}
    exp = {(r.query_id, r.rank): r.neighbor_id for r in cosine_topk_expr(emb, qf, k=5).collect()}
    assert vec == exp


def test_ivf_recall_against_exact(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qf = F.col("vec_id") % 50 == 0
    exact = _topk_sets(cosine_topk(emb, qf, k=5))
    approx = _topk_sets(cosine_topk_ivf(emb, qf, k=5, n_lists=16, n_probe=4))
    hits = total = 0
    for q, truth in exact.items():
        got = approx.get(q, set())
        hits += len(truth & got)
        total += len(truth)
    recall = hits / total
    # embeddings are cluster-structured (label column); 4/16 probes
    # should capture most true neighbors
    assert recall >= 0.6, f"recall@5 {recall:.2f}"


def test_ivf_full_probe_equals_exact(spark):
    """Probing every list degenerates to brute force -> identical sets."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qf = F.col("vec_id") % 100 == 0
    exact = _topk_sets(cosine_topk(emb, qf, k=5))
    full = _topk_sets(cosine_topk_ivf(emb, qf, k=5, n_lists=8, n_probe=8))
    assert exact == full
