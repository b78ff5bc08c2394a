"""Text pipeline, part 4 — retrieval and corpus-statistics operators a
training-data platform needs next to dedup/quality: BM25 sparse retrieval,
vocabulary/Zipf statistics, sentence segmentation, and unigram
log-likelihood scoring (a self-trained gibberish detector).

Reference scope: these extend nvtext (cpp/src/text/) the same way
tfidf/quality/decontaminate already do — corpus-level token statistics the
reference's tokenize/ngram primitives exist to feed. All oracles replay
the full algorithm (tokenization, frequencies, the scoring formula) in
DuckDB SQL; floating-point outputs are rounded on BOTH engines because
reduction order differs across engines (last-ULP drift only).

100 TB design notes, per query:
- BM25: query terms filter BEFORE any shuffle (term postings for 4 terms,
  not the full inverted index); doc-length table is one keyed groupBy;
  the per-term df fits in one broadcastable k-row aggregate.
- vocab stats: one token-frequency groupBy (map-side partial agg), then
  rank/regression over the top-100 rows only — the full vocabulary never
  leaves the cluster, no driver collect.
- sentence stats: embarrassingly parallel per-row higher-order
  expressions, zero shuffles beyond the scan.
- unigram loglik: token->frequency is a keyed JOIN (not a broadcast — at
  100 TB the vocabulary itself is cluster-scale), then one per-doc mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register
from cudf_spark.queries.text import SQL_NORM, SQL_TOKS

BM25_QUERY_TERMS = ("data", "join", "scan", "filter")
BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(df: DataFrame) -> DataFrame:
    """(doc_id, token) — normalized whitespace tokens, empties dropped."""
    from cudf_spark.functions.textfns import normalize_text, tokenize

    return df.select(
        "doc_id",
        F.explode(
            F.filter(tokenize(normalize_text(F.col("text"))), lambda t: t != "")
        ).alias("token"),
    )


# The toks→scored CTE chain (no WITH keyword) producing scored(doc_id, score)
# — shared by text_bm25_topk and retrieval_rrf_fusion so both engines run
# the identical BM25 formula.
SQL_BM25_CTES = f"""toks AS (
        SELECT doc_id, unnest(list_filter({SQL_TOKS}, t -> t != '')) AS token
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT avg(dl) FROM dl) AS avgdl),
    q AS (SELECT unnest({list(BM25_QUERY_TERMS)!r}) AS token),
    df AS (
        SELECT token, count(DISTINCT doc_id) AS df
        FROM toks JOIN q USING (token) GROUP BY token),
    tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM toks JOIN q USING (token) GROUP BY doc_id, token),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({BM25_K1} + 1)
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl))
               ) AS score
        FROM tf
        JOIN df USING (token)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id)"""


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25): the BM25 score table (rounded 6) for the fixed
    query-term set — the Spark mirror of :data:`SQL_BM25_CTES`."""
    # Catalyst has no cross-branch CSE: without materialization the
    # corpus-wide tokenize+explode subtree runs ~4x (dl join, avgdl,
    # dfreq, tf) — same fix as text_tfidf_topk's checkpoint (localCheckpoint,
    # not persist: measured round 8, operators/dedup.py tradeoff note)
    toks = _tokens(docs).localCheckpoint(eager=False)
    q = F.lit(list(BM25_QUERY_TERMS))
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl")
    ).localCheckpoint(eager=False)
    qtoks = toks.filter(F.array_contains(q, F.col("token")))
    dfreq = qtoks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    tf = qtoks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {SQL_BM25_CTES}
    SELECT doc_id, round(score, 6) AS bm25,
           CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
                AS INT) AS rnk
    FROM scored
    QUALIFY rnk <= 50
    ORDER BY rnk
    """,
    doc="BM25 sparse retrieval (Robertson/Sparck Jones — public IR "
    "literature; k1=1.2, b=0.75, Lucene idf form). Query terms filter "
    "before any shuffle: the plan builds 4-term postings + one doc-length "
    "table, never a full inverted index. Rank over the ROUNDED score with "
    "doc_id tiebreak so the top-50 boundary is deterministic across "
    "engines.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.windows import bounded_global_rank

    docs = load(spark, sf_dir, "documents")
    scored = bm25_scored(docs)
    # TakeOrderedAndProject top-50 FIRST, then rank the 50 survivors —
    # a bare global row_number window would funnel every scored doc into
    # one task (operators/windows.py:bounded_global_rank).
    return bounded_global_rank(
        scored, 50, [F.col("bm25").desc(), F.col("doc_id")]
    ).orderBy("rnk")


@register(
    "text_vocab_stats",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(list_filter({SQL_TOKS}, t -> t != '')) AS token
        FROM documents),
    freq AS (SELECT token, count(*) AS f FROM toks GROUP BY token),
    ranked AS (
        SELECT token, f,
               row_number() OVER (ORDER BY f DESC, token) AS r
        FROM freq)
    SELECT (SELECT count(*) FROM freq)                       AS vocab_size,
           (SELECT CAST(sum(f) AS BIGINT) FROM freq)         AS total_tokens,
           (SELECT count(*) FROM freq WHERE f = 1)           AS hapax_count,
           (SELECT token FROM ranked WHERE r = 1)            AS top_token,
           (SELECT f FROM ranked WHERE r = 1)                AS top_freq,
           (SELECT round(regr_slope(ln(f), ln(r)), 6)
            FROM ranked WHERE r <= 100)                      AS zipf_slope
    """,
    doc="Corpus vocabulary statistics + Zipf slope: one token-frequency "
    "groupBy (map-side partial agg), then scalar aggregates and an OLS "
    "slope of ln(freq) on ln(rank) over the top-100 tokens only "
    "(covar_pop/var_pop == regr_slope). Rank ties break on token text so "
    "both engines rank identically. The full vocabulary never collects.",
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.windows import bounded_global_rank

    docs = load(spark, sf_dir, "documents")
    freq = _tokens(docs).groupBy("token").agg(F.count(F.lit(1)).alias("f"))
    # rank only the TakeOrdered top-100, not the whole vocabulary — the
    # bare global window would single-task the full token table
    ranked = bounded_global_rank(
        freq, 100, [F.col("f").desc(), F.col("token")], rank_col="r"
    )
    top100 = ranked.select(F.log("f").alias("y"), F.log("r").alias("x"))
    # nullif: a 0/1-token vocabulary has var(x)=0 (or NULL) — slope is
    # undefined, matching DuckDB regr_slope's NULL, never an ANSI 0/0
    # abort (r11 fuzz, hostile empty-documents tree)
    slope = top100.agg(
        F.round(
            F.covar_pop("y", "x") / F.nullif(F.var_pop("x"), F.lit(0.0)), 6
        ).alias("zipf_slope")
    )
    totals = freq.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("f").cast("bigint").alias("total_tokens"),
        # count(when), not sum(when): the oracle's `count(*) WHERE f=1`
        # is 0 on an empty vocabulary, a sum would be NULL
        F.count(F.when(F.col("f") == 1, 1)).alias("hapax_count"),
    )
    # aggregate, not filter(r==1): a global agg still emits its one row
    # (NULL-valued) on an empty vocabulary, while an empty top1 frame
    # would annihilate the crossJoin and drop the output row entirely
    top1 = ranked.agg(
        F.min_by("token", "r").alias("top_token"),
        F.min_by("f", "r").alias("top_freq"),
    )
    return (
        totals.crossJoin(F.broadcast(top1))
        .crossJoin(F.broadcast(slope))
        .select(
            "vocab_size",
            "total_tokens",
            "hapax_count",
            "top_token",
            "top_freq",
            "zipf_slope",
        )
    )


@register(
    "text_sentence_stats",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(text, '[.!?]+'),
                                  x -> trim(regexp_replace(x, '\\s+', ' ', 'g'))),
                   x -> x != '') AS sents
        FROM documents)
    SELECT doc_id,
           len(sents)                                            AS n_sentences,
           COALESCE(round(list_avg(list_transform(sents,
                         x -> len(string_split(x, ' ')))), 4), 0.0)
                                                                 AS avg_words,
           COALESCE(list_max(list_transform(sents, x -> length(x))), 0)
                                                                 AS max_sent_chars,
           COALESCE(sents[1], '')                                AS first_sentence
    FROM s ORDER BY doc_id
    """,
    doc="Sentence segmentation statistics (the chunk-boundary primitive "
    "for context-window packing): split on terminal punctuation runs, "
    "whitespace-normalize each sentence, per-doc count / mean word count "
    "/ max char length / first sentence. Pure higher-order Column "
    "expressions — zero shuffles beyond the scan.",
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), r"[.!?]+"),
            lambda x: F.trim(F.regexp_replace(x, r"\s+", " ")),
        ),
        lambda x: x != "",
    )
    d = docs.select("doc_id", sents.alias("sents"))
    words_per = F.transform(F.col("sents"), lambda x: F.size(F.split(x, " ")))
    return d.select(
        "doc_id",
        F.size("sents").alias("n_sentences"),
        F.coalesce(
            F.round(
                F.aggregate(
                    words_per,
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                    lambda acc: F.when(
                        F.size("sents") > 0, acc / F.size("sents")
                    ),
                ),
                4,
            ),
            F.lit(0.0),
        ).alias("avg_words"),
        F.coalesce(
            F.array_max(F.transform(F.col("sents"), F.length)), F.lit(0)
        ).alias("max_sent_chars"),
        # try_element_at: plain element_at on an empty sents array (a
        # whitespace/punctuation-only doc) RAISES under Spark 4 ANSI —
        # coalesce cannot catch a thrown error
        F.coalesce(F.try_element_at("sents", F.lit(1)), F.lit("")).alias(
            "first_sentence"
        ),
    ).orderBy("doc_id")


@register(
    "text_unigram_loglik",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter({SQL_TOKS}, t -> t != '')) AS token
        FROM documents),
    freq AS (SELECT token, count(*) AS f FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(f) AS DOUBLE) AS n FROM freq)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT)                     AS n_tokens,
           round(avg(ln(freq.f / tot.n)), 6)            AS mean_loglik
    FROM toks t JOIN freq USING (token) CROSS JOIN tot
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    doc="Self-trained unigram log-likelihood score (the classic cheap "
    "gibberish/outlier detector): p(token) from the corpus itself, score "
    "= mean ln p over the doc's tokens. Token->frequency is a keyed JOIN, "
    "not a broadcast — at 100 TB the vocabulary is cluster-scale; the "
    "total-count scalar IS broadcast (one row).",
)
def text_unigram_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # materialize: toks feeds freq AND the scoring join (and freq feeds
    # tot) — without the checkpoints the corpus explode runs ~3x
    toks = _tokens(docs).localCheckpoint(eager=False)
    freq = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("f")
    ).localCheckpoint(eager=False)
    tot = freq.agg(F.sum("f").cast("double").alias("n"))
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("f") / F.col("n"))), 6).alias("mean_loglik"),
        )
        .orderBy("doc_id")
    )
