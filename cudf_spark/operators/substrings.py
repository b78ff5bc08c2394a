"""Substring-level (sub-document) duplicate-span detection — the
distributed counterpart of the reference's suffix-array
``resolve_duplicates`` (cpp/include/nvtext/deduplicate.hpp:66): report
spans of at least ``min_length`` characters that occur more than once in
the corpus (across documents OR repeated within one document, matching the
reference's self-duplicate semantics).

Spark-first formulation — no suffix array, no UDF, three shuffles total:

1. k-gram index: every ``min_length``-char gram of every doc, generated
   JVM-side (``sequence`` + ``transform`` + ``explode``).
2. duplicated grams: grams with more than one occurrence — one hash
   shuffle on the gram; cost ∝ corpus size, never pairwise.
3. islands: per doc, consecutive duplicated positions merge into maximal
   spans via the classic pos − row_number() gaps-and-islands window.

Every reported span is a union of overlapping k-grams that each occur
elsewhere; this is a (well-known) superset of the exact suffix-array
answer — an adjacent pair of duplicated grams may match *different* peer
docs. ``resolve_duplicate_spans`` (below) computes the exact answer by
diagonal chaining; the raw k-gram pass is the cheap scale path.
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
    # and everything downstream parallelizes — but only when the input is
    # UNDER-partitioned (one small local parquet file).  A well-partitioned
    # 100 TB input must not be funneled down to defaultParallelism.
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
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
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_length: int = 20,
    exact: bool = False,
    max_gram_freq: int | None = None,
    skew_safe: bool = False,
) -> DataFrame:
    """Maximal duplicated spans ≥ min_length chars.

    Returns (id, span_pos, span_len) — one row per maximal span whose every
    min_length-gram occurs at more than one (doc, pos) in the corpus
    (cross-document or repeated within a document — the reference's
    ``resolve_duplicates`` self-duplicate semantics).

    By default the dup check keys on ``xxhash64(gram)`` — the shuffle moves
    8 bytes instead of k chars and sorts longs instead of strings (measured
    2.8× end-to-end at sf0.1). A hash collision would report a false
    duplicate span: expected collisions ≈ n²/2⁶⁵ (≈ 3·10⁻⁸ at 10⁶ grams;
    still ≪ the k-gram approximation's own false-positive envelope at
    corpus scale). Pass ``exact=True`` to shuffle the gram strings.

    ``max_gram_freq`` caps boilerplate: grams occurring more often are
    treated as templating noise and dropped from anchoring (exact-document
    dedup still covers the pages built from them). This bounds the island
    windows and the span output under pathological corpora.

    Two physical shapes for the dup-gram pass:

    * default (``skew_safe=False``): one windowed ``count`` over the gram
      key — a single shuffle of the gram index, and WindowExec buffers one
      gram group at a time (spilling to disk past the buffer threshold), so
      a mega-frequent gram degrades to one slow spilling task, never an
      OOM. Fastest shape for normal corpora (the groupBy formulation
      measured 2.4× slower at sf0.1 — the explode subtree evaluates twice).
    * ``skew_safe=True``: groupBy(gram).count() (map-side partial
      aggregation — skew-immune by construction) semi-joined back to the
      gram index. The hot gram never concentrates raw rows in one task's
      buffer: it is filtered OUT of the build side by the cap, and AQE's
      skew-join splitting handles the probe. Pays a second evaluation of
      the gram explode; the right shape when boilerplate is expected.
    """
    grams = kgram_index(docs, id_col, text_col, min_length)
    gkey = F.col("gram") if exact else F.xxhash64("gram")
    cap = F.lit(max_gram_freq) if max_gram_freq is not None else None
    if skew_safe:
        keyed = grams.withColumn("gkey", gkey)
        freq = keyed.groupBy("gkey").agg(F.count(F.lit(1)).alias("cnt"))
        dup_keys = freq.filter(
            (F.col("cnt") > 1) & ((F.col("cnt") <= cap) if cap is not None else F.lit(True))
        )
        anchors = keyed.join(dup_keys.select("gkey"), "gkey", "left_semi").select(
            id_col, "pos"
        )
    else:
        wg = Window.partitionBy("gkey")
        cnt = F.count(F.lit(1)).over(wg)
        dup = (cnt > 1) & ((cnt <= cap) if cap is not None else F.lit(True))
        anchors = (
            grams.withColumn("gkey", gkey)
            .withColumn("__dup", dup)
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


def resolve_duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_length: int = 20,
    exact: bool = False,
    max_gram_freq: int | None = 64,
) -> DataFrame:
    """EXACT maximal duplicated spans ≥ min_length chars — the reference's
    ``resolve_duplicates`` semantics (cpp/include/nvtext/deduplicate.hpp:66)
    without a suffix array, via k-gram diagonal chaining.

    Two positions (d1,p1), (d2,p2) sharing a k-gram lie on the pair
    diagonal (d1, d2, p2−p1). A run of CONSECUTIVE p1 values on one
    diagonal is a character-exact common substring of exactly
    ``run_len − 1 + k`` chars: overlapping equal k-grams force full
    equality, the run's start cannot extend backward (equal preceding
    chars would imply an equal preceding gram pair, which would be in the
    run), and its end cannot extend forward symmetrically. So maximal
    diagonal runs ARE the maximal pair matches — found with one
    gaps-and-islands window, zero substring comparisons.

    A span contained inside a longer duplicated span of the same doc is
    not maximal corpus-wide; a per-doc sweep (start asc, end desc, keep
    end > running max end) removes it.

    Cost: the gram self-join emits freq² pairs per distinct gram —
    ``max_gram_freq`` (mandatory in spirit; default 64) caps it, dropping
    boilerplate grams exactly as ``duplicate_spans`` does. Candidate
    volume is Σ freq² over surviving grams: proportional to true
    duplication, never all-pairs over the corpus.
    """
    grams = kgram_index(docs, id_col, text_col, min_length)
    gkey = F.col("gram") if exact else F.xxhash64("gram")
    g = grams.select(
        F.col(id_col).alias("d"), F.col("pos").alias("p"), gkey.alias("gkey")
    )
    if max_gram_freq is not None:
        wg = Window.partitionBy("gkey")
        g = (
            g.withColumn("__n", F.count(F.lit(1)).over(wg))
            .filter(F.col("__n") <= max_gram_freq)
            .drop("__n")
        )
    a = g.select(F.col("d").alias("d1"), F.col("p").alias("p1"), "gkey")
    b = g.select(F.col("d").alias("d2"), F.col("p").alias("p2"), "gkey")
    pairs = (
        a.join(b, "gkey")
        .filter((F.col("d1") != F.col("d2")) | (F.col("p1") != F.col("p2")))
        .select("d1", "p1", "d2", (F.col("p2") - F.col("p1")).alias("off"))
    )
    wdiag = Window.partitionBy("d1", "d2", "off").orderBy("p1")
    runs = pairs.withColumn("isl", F.col("p1") - F.row_number().over(wdiag))
    per_pair = runs.groupBy("d1", "d2", "off", "isl").agg(
        F.min("p1").alias("span_pos"),
        (F.max("p1") - F.min("p1") + min_length).alias("span_len"),
    )
    intervals = per_pair.select(
        F.col("d1").alias(id_col), "span_pos", "span_len"
    ).distinct()
    wdoc = Window.partitionBy(id_col).orderBy(
        F.col("span_pos").asc(), F.col("span_len").desc()
    )
    prev_max_end = F.max(F.col("span_pos") + F.col("span_len")).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        intervals.withColumn("__pm", prev_max_end)
        .filter(
            F.col("__pm").isNull()
            | (F.col("span_pos") + F.col("span_len") > F.col("__pm"))
        )
        .select(id_col, "span_pos", "span_len")
    )
