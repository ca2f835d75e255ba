"""Deduplication operators for the documents table.

Scale-extension surface (BASELINE.json north star): exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard. No reference analogue —
the reference's only dedup is keep-latest-per-key
(reference base_loader.py:492-531, covered by ParquetTable.merge_upsert_dedup).

Design for 100 TB:
  * Exact dedup: one hash-shuffle on a 32-char fingerprint — the minimum
    possible work; map-side partial aggregation applies.
  * MinHash/LSH: shingle explode -> per-(doc, seed) min-hash -> band
    signatures -> equi-join on (band, band_sig). Candidate generation is
    an equi-join, never an n^2 cross join; band buckets bound skew, and
    the pair set is tiny relative to the corpus.
  * n-gram Jaccard: equi-join on shared shingles with distinct shingle
    sets, so |pairs| is bounded by co-occurrence, not n^2. For web-scale
    corpora you'd pre-filter by MinHash bands first (compose the two).
  * SimHash: explode (token x bit) then two aggregations; all JVM-side
    integer ops, no Python.

Every operator has a DuckDB-SQL twin (suffix ``_sql``) generated from
the same constants, so the driver's oracle executes the *same algorithm*
(identical md5-based hash family, see functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nomba_data_pipeline_spark.functions.hashing import h64, h64_sql
from nomba_data_pipeline_spark.functions.text import (
    fingerprint,
    fingerprint_sql,
    normalized_text_sql,
    tokens,
)

NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_N = 3
SIMHASH_BITS = 60


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by content fingerprint; keeper = min id. One shuffle."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def exact_dedup_groups_sql(table: str = "documents") -> str:
    return f"""
    SELECT {fingerprint_sql('text')} AS fp,
           min(doc_id) AS keeper_id,
           count(*) AS group_size
    FROM {table}
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# shingling (shared by MinHash and Jaccard)
# ---------------------------------------------------------------------------
def shingle_set(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document (set semantics)."""
    toked = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    shingle_expr = f"""
        CASE WHEN size(toks) >= {SHINGLE_N}
             THEN transform(sequence(1, size(toks) - {SHINGLE_N - 1}),
                            i -> concat_ws(' ', element_at(toks, i),
                                                element_at(toks, i + 1),
                                                element_at(toks, i + 2)))
             ELSE array()
        END
    """
    return (
        toked.select("doc_id", F.explode(F.expr(shingle_expr)).alias("shingle"))
        .distinct()
    )


def shingle_set_sql(table: str = "documents") -> str:
    nt = normalized_text_sql("text")
    return f"""
    SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
    FROM (
        SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM (SELECT doc_id, string_split({nt}, ' ') AS t FROM {table})
        WHERE len(t) >= {SHINGLE_N}
    )
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, seed, minhash) for NUM_PERM salted hash families."""
    seeds = shingles.sparkSession.range(NUM_PERM).withColumnRenamed("id", "seed")
    salted = F.concat(F.lit("s"), F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))
    return (
        shingles.crossJoin(F.broadcast(seeds))
        .select("doc_id", "seed", h64(salted).alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )


def lsh_bands(signatures: DataFrame) -> DataFrame:
    """Band signatures: concat of the band's minhashes in seed order."""
    return (
        signatures.withColumn("band", (F.col("seed") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
            ).alias("band_sig")
        )
    )


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-duplicate pairs: any shared LSH band bucket."""
    bands = lsh_bands(minhash_signatures(shingle_set(docs)))
    left = bands.alias("x")
    right = bands.alias("y")
    return (
        left.join(right, on=["band", "band_sig"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs_sql(table: str = "documents") -> str:
    mh_hash = h64_sql("concat('s', seed, ':', shingle)")
    return f"""
    WITH sh AS ({shingle_set_sql(table)}),
    mh AS (
        SELECT doc_id, seed, min({mh_hash}) AS mh
        FROM sh CROSS JOIN (SELECT unnest(range({NUM_PERM})) AS seed)
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, CAST(seed // {ROWS_PER_BAND} AS INT) AS band,
               string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_sig
        FROM mh GROUP BY doc_id, band
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y ON x.band = y.band AND x.band_sig = y.band_sig
    WHERE x.doc_id < y.doc_id
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing >= 1 shingle."""
    sh = shingle_set(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        sh.alias("x")
        .join(sh.alias("y"), on="shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(table: str = "documents", threshold: float = 0.5) -> str:
    return f"""
    WITH sh AS ({shingle_set_sql(table)}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(c.common AS DOUBLE) / CAST(a.sz + b.sz - c.common AS DOUBLE), 6) AS jaccard
    FROM common c
    JOIN sizes a ON c.doc_a = a.doc_id
    JOIN sizes b ON c.doc_b = b.doc_id
    WHERE round(CAST(c.common AS DOUBLE) / CAST(a.sz + b.sz - c.common AS DOUBLE), 6) >= {threshold}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document (token multiplicity preserved)."""
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")).select(
        "doc_id", F.explode("toks").alias("token")
    )
    hashed = toks.select("doc_id", h64(F.col("token")).alias("h"))
    bits = hashed.select(
        "doc_id",
        "h",
        F.explode(F.expr(f"sequence(0, {SIMHASH_BITS - 1})")).alias("b"),
    ).select(
        "doc_id",
        "b",
        F.when(F.expr("(h >> b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)).alias("contrib"),
    )
    per_bit = bits.groupBy("doc_id", "b").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def simhash_sql(table: str = "documents") -> str:
    nt = normalized_text_sql("text")
    th = h64_sql("token")
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({nt}, ' ')) AS token FROM {table}
    ),
    hashed AS (SELECT doc_id, {th} AS h FROM toks),
    bits AS (
        SELECT doc_id, b,
               CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS contrib
        FROM hashed CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS b)
    ),
    per_bit AS (SELECT doc_id, b, sum(contrib) AS s FROM bits GROUP BY doc_id, b)
    SELECT doc_id,
           sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
    FROM per_bit GROUP BY doc_id
    """
