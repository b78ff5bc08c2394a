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
    docs: DataFrame, id_col: str, text_col: str, *, min_length: int = 20
) -> DataFrame:
    """Maximal duplicated spans ≥ min_length chars across documents.

    Returns (id, span_pos, span_len) — one row per maximal span whose every
    min_length-gram also occurs in at least one OTHER document.
    """
    grams = kgram_index(docs, id_col, text_col, min_length)
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("gram")
    )
    anchors = grams.join(dup, "gram", "left_semi")
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
