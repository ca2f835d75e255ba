"""Streaming corpus dedup (corpus_dedup_apply_batch): batch-boundary
invariance under ascending arrival, checkpoint-replay idempotence, and
the crash-between-append-and-commit determinism guard. The sf0.01
oracle parity of the graded row lives in test_queries_vs_duckdb.py."""

from pyspark.sql import functions as F

from nomba_data_pipeline_spark.operators.dedup import minhash_index_write
from nomba_data_pipeline_spark.streaming.microbatch import corpus_dedup_apply_batch


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# corpus doc 1 and incoming docs 10/30 share one text family; 20/21 are a
# within-batch twin pair; 40 is novel. Texts are long enough to clear the
# shingle width so every doc has band rows.
CORPUS = [(1, "the quick brown fox jumps over the lazy dog again and again")]
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog again and again"),
    (20, "completely different second text about spark structured streaming"),
    (21, "completely different second text about spark structured streaming"),
    (30, "the quick brown fox jumps over the lazy dog again and again"),
    (40, "a third unrelated document mentioning parquet band indexes only"),
]
EXPECT = {10: True, 20: False, 21: True, 30: True, 40: False}


def _flags(spark, path):
    return {
        r.doc_id: r.is_dup
        for r in spark.read.parquet(path).select("doc_id", "is_dup").collect()
    }


def _index_ids(spark, path):
    return sorted(
        r.doc_id for r in spark.read.parquet(path).select("doc_id").distinct().collect()
    )


def test_flag_semantics_and_batch_split_invariance(spark, tmp_path):
    """One batch vs three ascending batches must yield identical flags:
    corpus collisions flag regardless of id, within-arrival collisions
    flag only the later (higher) doc_id, dups still enter the index."""
    docs = _mkdocs(spark, BATCH)
    for name, splits in (
        ("one", [BATCH]),
        ("three", [BATCH[:2], BATCH[2:4], BATCH[4:]]),
    ):
        idx = str(tmp_path / f"idx_{name}")
        flags = str(tmp_path / f"flags_{name}")
        minhash_index_write(_mkdocs(spark, CORPUS), idx)
        for bid, chunk in enumerate(splits):
            corpus_dedup_apply_batch(_mkdocs(spark, chunk), bid, idx, flags)
        assert _flags(spark, flags) == EXPECT, name
        # every batch doc entered the index exactly once
        assert _index_ids(spark, idx) == [1, 10, 20, 21, 30, 40], name


def test_checkpoint_replay_is_idempotent(spark, tmp_path):
    """Re-running a COMPLETED batch under the same id (checkpoint replay
    after a crash before commit) must change neither flags nor index."""
    idx, flags = str(tmp_path / "idx"), str(tmp_path / "flags")
    minhash_index_write(_mkdocs(spark, CORPUS), idx)
    docs = _mkdocs(spark, BATCH)
    corpus_dedup_apply_batch(docs, 0, idx, flags)
    n_index = spark.read.parquet(idx).count()
    corpus_dedup_apply_batch(docs, 0, idx, flags)  # replay
    assert _flags(spark, flags) == EXPECT
    assert spark.read.parquet(idx).count() == n_index


def test_replay_after_append_before_flags_commit(spark, tmp_path):
    """Worst-case crash window: the index append completed but the
    replay recomputes flags with its own rows already indexed. The
    current-batch anti-join on the index probe must keep the verdicts
    identical to the first attempt (not all-dup self-matches)."""
    import shutil

    idx, flags = str(tmp_path / "idx"), str(tmp_path / "flags")
    minhash_index_write(_mkdocs(spark, CORPUS), idx)
    docs = _mkdocs(spark, BATCH)
    corpus_dedup_apply_batch(docs, 0, idx, flags)
    shutil.rmtree(flags)  # flags output lost, index retains batch rows
    corpus_dedup_apply_batch(docs, 0, idx, flags)
    assert _flags(spark, flags) == EXPECT
    assert _index_ids(spark, idx) == [1, 10, 20, 21, 30, 40]


def test_bootstrap_without_index(spark, tmp_path):
    """First batch ever: no index on disk — only within-arrival order
    flags apply, and the write creates the index for the next batch."""
    idx, flags = str(tmp_path / "idx"), str(tmp_path / "flags")
    corpus_dedup_apply_batch(_mkdocs(spark, BATCH), 0, idx, flags)
    assert _flags(spark, flags) == {10: False, 20: False, 21: True, 30: True, 40: False}
    # second drain sees the bootstrap index
    corpus_dedup_apply_batch(
        _mkdocs(spark, [(50, BATCH[0][1])]), 1, idx, flags
    )
    assert _flags(spark, flags)[50] is True
