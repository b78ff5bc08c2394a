"""Hybrid retrieval — reciprocal-rank fusion of a sparse (BM25) and a
dense (embedding-cosine) ranker, the standard way a training-data platform
serves "find documents like X" over both signals (public IR practice:
Cormack, Clarke & Buettcher 2009, RRF; used verbatim by every hybrid-search
engine).

100 TB design: each ranker is its own bounded pipeline (BM25: keyed
groupBys + a rank-bounded window; dense: one corpus scan against a
broadcast query vector) producing at most ``DEPTH`` rows; the fusion join
touches only those 2·DEPTH rows — driver never sees unbounded data, and
the two rankers parallelize independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.operators.similarity import cosine
from cudf_spark.queries.registry import register
from cudf_spark.queries.similarity import _sql_cosine
from cudf_spark.queries.text4 import SQL_BM25_CTES, bm25_scored

RRF_K = 60  # the canonical RRF constant
DEPTH = 100  # per-ranker candidate depth
TOP_N = 20


@register(
    "retrieval_rrf_fusion",
    oracle=f"""
    WITH {SQL_BM25_CTES},
    sparse AS (
        SELECT doc_id AS id,
               CAST(row_number() OVER (
                   ORDER BY round(score, 6) DESC, doc_id) AS INT) AS r_s
        FROM scored QUALIFY r_s <= {DEPTH}),
    qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dense AS (
        SELECT e.vec_id AS id,
               CAST(row_number() OVER (
                   ORDER BY round({_sql_cosine('e.embedding', 'qv.qv')}, 6) DESC,
                            e.vec_id) AS INT) AS r_d
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id != 0
        QUALIFY r_d <= {DEPTH}),
    fused AS (
        SELECT coalesce(sparse.id, dense.id) AS id, r_s, r_d,
               round(coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + r_s), 0.0)
                     + coalesce(CAST(1.0 AS DOUBLE) / ({RRF_K} + r_d), 0.0), 9) AS rrf
        FROM sparse FULL JOIN dense ON sparse.id = dense.id)
    SELECT id, r_s, r_d, rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INT) AS rnk
    FROM fused QUALIFY rnk <= {TOP_N}
    ORDER BY rnk
    """,
    doc="Reciprocal-rank fusion (Cormack et al. 2009, k=60) of BM25 over "
    "documents and embedding-cosine over the aligned vector corpus: each "
    f"ranker contributes its top-{DEPTH} with deterministic "
    "(rounded-score, id) ordering; fused score = sum of 1/(60+rank); "
    f"top-{TOP_N} returned. The fusion join touches 2x{DEPTH} rows "
    "regardless of corpus size.",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    from cudf_spark.operators.windows import bounded_global_rank

    # each ranker: TakeOrderedAndProject to DEPTH, then rank the bounded
    # survivors — a bare global row_number window would single-task the
    # full scored set (operators/windows.py:bounded_global_rank)
    sparse = bounded_global_rank(
        bm25_scored(docs), DEPTH, [F.col("bm25").desc(), F.col("doc_id")], rank_col="r_s"
    ).select(F.col("doc_id").alias("id"), "r_s")

    qv = F.broadcast(emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qv")))
    dense = bounded_global_rank(
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("__qv")), 6).alias("cos")),
        DEPTH,
        [F.col("cos").desc(), F.col("vec_id")],
        rank_col="r_d",
    ).select(F.col("vec_id").alias("id"), "r_d")

    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("r_s")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("r_d")), F.lit(0.0)),
        9,
    )
    wr = Window.orderBy(F.col("rrf").desc(), F.col("id"))
    return (
        sparse.join(dense, "id", "full_outer")
        .select("id", "r_s", "r_d", rrf.alias("rrf"))
        .withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= TOP_N)
        .orderBy("rnk")
    )
