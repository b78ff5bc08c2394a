"""Substring-level (sub-document) duplicate-span detection — the
distributed counterpart of the reference's suffix-array
``resolve_duplicates`` (cpp/include/nvtext/deduplicate.hpp:66): report
spans of at least ``min_length`` characters that occur in more than one
document (or more than once overall).

Spark-first formulation — no suffix array, no UDF, three shuffles total:

1. k-gram index: every ``min_length``-char gram of every doc, generated
   JVM-side (``sequence`` + ``transform`` + ``explode``).
2. duplicated grams: groupBy(gram) keeping those seen in >1 doc — one hash
   shuffle on the gram; cost ∝ corpus size, never pairwise.
3. islands: per doc, consecutive duplicated positions merge into maximal
   spans via the classic pos − row_number() gaps-and-islands window.

Every reported span is a union of overlapping k-grams that each occur
elsewhere; this is a (well-known) superset of the exact suffix-array
answer — an adjacent pair of duplicated grams may match *different* peer
docs. The reference's exact semantics need a distributed suffix array
(out of scope; documented in COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kgram_index(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, gram) for every k-char gram; 1-based positions.

    The position sequence is guarded for docs shorter than k (``sequence``
    with stop < start would count DOWN, not produce an empty array).
    """
    # The gram explode multiplies rows ×(doc_len − k + 1); spread the CHEAP
    # side (raw docs) across the cluster before the fan-out so the explode
    # and everything downstream parallelizes. Locally a single small
    # parquet file would otherwise pin the whole pipeline to one task.
    sc = docs.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism)
    n_pos = F.length(text_col) - k + 1
    positions = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        positions, lambda i: F.struct(i.alias("pos"), F.col(text_col).substr(i, F.lit(k)).alias("gram"))
    )
    return docs.select(F.col(id_col), F.explode(grams).alias("pg")).select(
        id_col, F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram")
    )


def duplicate_spans(
    docs: DataFrame, id_col: str, text_col: str, *, min_length: int = 20, exact: bool = False
) -> DataFrame:
    """Maximal duplicated spans ≥ min_length chars across documents.

    Returns (id, span_pos, span_len) — one row per maximal span whose every
    min_length-gram also occurs in at least one OTHER document.

    By default the dup check keys on ``xxhash64(gram)`` — the shuffle moves
    8 bytes instead of k chars and sorts longs instead of strings (measured
    2.8× end-to-end at sf0.1). A hash collision would report a false
    duplicate span: expected collisions ≈ n²/2⁶⁵ (≈ 3·10⁻⁸ at 10⁶ grams;
    still ≪ the k-gram approximation's own false-positive envelope at
    corpus scale). Pass ``exact=True`` to shuffle the gram strings.
    """
    grams = kgram_index(docs, id_col, text_col, min_length)
    gkey = F.col("gram") if exact else F.xxhash64("gram")
    # "gram occurs in >1 distinct doc" ⟺ min(doc_id) ≠ max(doc_id) over the
    # gram — one shuffle, one pass. The groupBy(gram)+semi-join formulation
    # evaluates the whole k-gram explode subtree TWICE (no cross-branch CSE
    # in Catalyst) and shuffles twice; measured 2.4× slower at sf0.1.
    wg = Window.partitionBy("gkey")
    anchors = (
        grams.withColumn("gkey", gkey)
        .withColumn("__dup", F.min(id_col).over(wg) != F.max(id_col).over(wg))
        .filter(F.col("__dup"))
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = anchors.withColumn("island", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_pos"),
            (F.max("pos") - F.min("pos") + min_length).alias("span_len"),
        )
        .drop("island")
    )
