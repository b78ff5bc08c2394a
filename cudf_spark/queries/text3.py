"""Training-data curation operators, part 3: benchmark decontamination,
Gopher-style repetition signals, TF-IDF keywording, greedy sequence
packing, PII redaction.

These extend the nvtext-derived surface (SURVEY §2.11; reference
cpp/include/nvtext/) with the corpus-preparation steps a large-scale
pretraining pipeline runs after dedup/quality gating. All are pure
DataFrame plans — one doc_id-keyed shuffle chain each, no UDFs — and every
query carries a full-algorithm DuckDB oracle.

Cross-engine care: DuckDB SUM/COUNT_IF over integers yields HUGEINT, which
the driver's hasher serializes differently from BIGINT — every such oracle
column is CAST to BIGINT. Scores avoid ``ln`` (libm last-ulp divergence
between engines); the TF-IDF uses the order-equivalent rational form
``tf * N / df`` whose double result is a single identical IEEE rounding in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.functions.hashing import hash60, hash60_sql
from cudf_spark.functions.textfns import (
    normalize_text,
    tokenize,
    top_token_count,
    word_shingles,
)
from cudf_spark.queries.registry import register

# single source of truth for the oracle-side normalization contract —
# a local copy here could silently diverge from text/text4/retrieval
from cudf_spark.queries.text import SQL_NORM, SQL_TOKS  # noqa: F401

STOPWORDS = ("the", "a", "of", "to", "and")


def _sql_grams(k: int) -> str:
    """DuckDB distinct word k-gram list over token list ``w`` (1-based)."""
    return (
        "list_distinct(list_transform("
        f"generate_series(1, greatest(len(w) - {k - 1}, 0)),"
        f" i -> array_to_string(w[i:i+{k - 1}], ' ')))"
    )


@register(
    "text_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    grams AS (
      SELECT doc_id, unnest({_sql_grams(5)}) AS g FROM toks
    ),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
    hits AS (
      SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n
      FROM grams c JOIN eval_grams USING (g)
      WHERE c.doc_id % 10 != 0
      GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           coalesce(n, 0)     AS n_overlap_grams,
           coalesce(n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits USING (doc_id)
    WHERE d.doc_id % 10 != 0
    ORDER BY doc_id
    """,
    doc="Benchmark decontamination: flag training docs sharing any word "
    "5-gram with a held-out eval set (doc_id % 10 == 0 stands in for the "
    "benchmark). The GPT-3/PaLM n-gram-overlap recipe: explode distinct "
    "5-grams, broadcast the (small) eval gram set, count hits per doc. "
    "At 100 TB the eval side stays benchmark-sized, so the join is a "
    "broadcast — the corpus is touched in one pass with no self-shuffle.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # materialize: both the eval_grams branch and the hits branch consume
    # this subtree, and Catalyst has no cross-branch CSE — without the
    # checkpoint the corpus-wide normalize+shingle+explode runs twice
    # (localCheckpoint, not persist — measured round 8: the InMemoryRelation
    # columnar-cache build costs 2-4x on these hot intermediates; see
    # operators/dedup.py:lsh_candidate_pairs for the full tradeoff)
    grams = d.select(
        "doc_id", F.explode(word_shingles(normalize_text(F.col("text")), k=5)).alias("g")
    ).localCheckpoint(eager=False)
    eval_grams = grams.filter(F.col("doc_id") % 10 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 10 != 0)
        # per-doc grams and the eval side are both distinct, so the join
        # multiplicity is 1 and count(*) == count(DISTINCT g)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        d.filter(F.col("doc_id") % 10 != 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).alias("n_overlap_grams"),
            (F.coalesce("n", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS t FROM toks),
    pc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    agg AS (
      SELECT doc_id,
             max(c)                    AS top_cnt,
             CAST(sum(c) AS BIGINT)    AS n_tok,
             CAST(count(*) AS BIGINT)  AS n_distinct
      FROM pc GROUP BY doc_id
    ),
    g2 AS (
      SELECT doc_id,
             CAST(len({_sql_grams(2)}) AS BIGINT)      AS distinct_2g,
             CAST(greatest(len(w) - 1, 0) AS BIGINT)   AS total_2g
      FROM toks
    )
    SELECT a.doc_id,
           top_cnt * 1.0 / n_tok     AS top_token_frac,
           n_distinct * 1.0 / n_tok  AS distinct_token_frac,
           CASE WHEN total_2g > 0
                THEN 1.0 - distinct_2g * 1.0 / total_2g
                ELSE 0.0 END         AS dup_2gram_frac
    FROM agg a JOIN g2 USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Gopher-style repetition filters (Rae et al. 2021 §A1.1): fraction "
    "of tokens taken by the most frequent token, distinct-token fraction, "
    "duplicated-2-gram fraction. Token counts shuffle once on doc_id; the "
    "2-gram stats are pure array expressions (no explode). Both sides "
    "divide BIGINTs to double — one identical IEEE rounding per cell.",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    tok = d.select("doc_id", F.explode(tokenize(norm)).alias("t"))
    agg = (
        tok.groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_cnt"),
            F.sum("c").alias("n_tok"),
            F.count("*").alias("n_distinct"),
        )
    )
    g2 = d.select(
        "doc_id",
        F.size(word_shingles(norm, k=2)).cast("long").alias("distinct_2g"),
        F.greatest(F.size(tokenize(norm)) - 1, F.lit(0)).cast("long").alias("total_2g"),
    )
    return (
        agg.join(g2, "doc_id")
        .select(
            "doc_id",
            (F.col("top_cnt") / F.col("n_tok")).alias("top_token_frac"),
            (F.col("n_distinct") / F.col("n_tok")).alias("distinct_token_frac"),
            F.when(
                F.col("total_2g") > 0,
                F.lit(1.0) - F.col("distinct_2g") / F.col("total_2g"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_2gram_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_TOKS}) AS t FROM documents),
    tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.t AS token, tf.tf, df.df,
             tf.tf * n.n_docs * 1.0 / df.df AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * n.n_docs * 1.0 / df.df DESC, tf.t
             ) AS rk
      FROM tf JOIN df USING (t) CROSS JOIN n
    )
    SELECT doc_id, rk, token, tf, df, score
    FROM scored WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
    doc="TF-IDF keyword extraction, top-3 per document. The rational score "
    "tf * N / df is order-equivalent to tf·idf under any monotone idf and "
    "cross-engine exact (no libm ln). Plan: one doc-keyed count shuffle, "
    "one token-keyed doc-frequency agg (broadcast back — vocabulary is "
    "tiny vs corpus), one windowed top-k per doc. Ties break on token.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_docs = d.groupBy().agg(F.count("*").alias("n_docs"))
    tok = d.select("doc_id", F.explode(tokenize(normalize_text(F.col("text")))).alias("t"))
    # tf feeds BOTH the document-frequency branch and the scoring join;
    # without materialization the tokenize+explode+count subtree runs
    # twice (no cross-branch CSE in Catalyst).
    tf = (
        tok.groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("t").agg(F.count("*").alias("df"))
    score = F.col("tf") * F.col("n_docs") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("t"))
    return (
        tf.join(F.broadcast(df_), "t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "rk",
            F.col("t").alias("token"),
            "tf",
            "df",
            score.alias("score"),
        )
        .orderBy("doc_id", "rk")
    )


@register(
    "doc_pack_greedy",
    oracle="""
    WITH cum AS (
      SELECT source, doc_id, n_chars,
             CAST(sum(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_chars
      FROM documents
    ),
    packed AS (SELECT source, doc_id, n_chars, (cum_chars - 1) // 2048 AS pack_id FROM cum)
    SELECT source, pack_id,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS pack_chars,
           min(doc_id)                   AS first_doc,
           max(doc_id)                   AS last_doc
    FROM packed GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
    doc="Greedy contiguous sequence packing: assign docs (in doc_id order "
    "within each source) to fixed 2048-char training bins via a running "
    "prefix sum — the standard pack-to-max-seq-len step before "
    "tokenization. One window + one agg, both partitioned by source; "
    "parallelism = number of sources at any scale.",
)
def doc_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "source",
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w) - 1).alias("cum0"),
    ).select(
        "source", "doc_id", "n_chars", F.expr("cum0 div 2048").alias("pack_id")
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("pack_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


@register(
    "text_redact_pii",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             'user' || doc_id || '@' || source || '.example reach at 555-'
               || lpad(CAST(doc_id AS VARCHAR), 4, '0') || ' re: '
               || substr(text, 1, 40) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
             '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM synth ORDER BY doc_id
    """,
    doc="PII redaction pass: scrub email/phone patterns with <EMAIL>/"
    "<PHONE> placeholders. The fixture text has no PII, so a deterministic "
    "contact line is synthesized per doc first; the redaction itself is "
    "plain regexp_replace — JVM-side, codegen, embarrassingly parallel. "
    "Patterns stay in the RE2 ∩ java.util.regex common dialect.",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example reach at 555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        F.lit(" re: "),
        F.substring(F.col("text"), 1, 40),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, r"[a-z0-9]+@[a-z0-9.]+", "<EMAIL>"),
        r"555-[0-9]{4}",
        "<PHONE>",
    )
    return d.select("doc_id", redacted.alias("redacted")).orderBy("doc_id")


@register(
    "curation_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, n_chars, {SQL_NORM} AS norm FROM documents
    ),
    tok AS (
      SELECT *,
             list_filter(string_split(norm, ' '), t -> t != '') AS wq,
             string_split(norm, ' ') AS w
      FROM base
    ),
    corpus AS (SELECT * FROM tok WHERE doc_id % 10 != 0),
    dedup AS (
      SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY md5(norm)) AS keeper FROM corpus
      ) WHERE keeper = doc_id
    ),
    qual AS (
      SELECT * FROM dedup
      WHERE len(wq) BETWEEN 20 AND 90
        AND len(list_intersect(list_distinct(wq),
                ['the', 'a', 'of', 'to', 'and'])) >= 2
        AND list_max(list_transform(list_distinct(wq),
                t -> len(list_filter(wq, x -> x = t)))) * 1.0 / len(wq) <= 0.12
    ),
    eval_grams AS (
      SELECT DISTINCT unnest({_sql_grams(5)}) AS g FROM tok WHERE doc_id % 10 = 0
    ),
    contaminated AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT doc_id, unnest({_sql_grams(5)}) AS g FROM qual) c
      JOIN eval_grams USING (g)
    ),
    kept AS (
      SELECT * FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    assigned AS (
      SELECT *,
             CASE WHEN {hash60_sql("CAST(doc_id AS VARCHAR)", seed=42)} % 100 < 80 THEN 'train'
                  WHEN {hash60_sql("CAST(doc_id AS VARCHAR)", seed=42)} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM kept
    ),
    packed AS (
      SELECT split, source, n_chars,
             (CAST(sum(n_chars) OVER (
                PARTITION BY split, source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS BIGINT) - 1) // 2048 AS pack_id
      FROM assigned
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(sum(n_chars) AS BIGINT)          AS sum_chars
    FROM packed GROUP BY split, source ORDER BY split, source
    """,
    doc="The full training-data curation pipeline as ONE declarative DAG: "
    "exact dedup (keep-first per md5 digest) -> Gopher quality gate "
    "(word-count / stopword / top-token-repetition rules) -> benchmark "
    "decontamination (5-gram overlap vs the held-out eval split, broadcast "
    "join) -> deterministic hash60 train/val/test assignment -> greedy "
    "2048-char sequence packing -> per-(split, source) corpus stats. "
    "Catalyst fuses the stages; every shuffle is keyed (digest, gram, "
    "doc_id, split+source) — nothing pairwise, nothing single-partition, "
    "which is exactly the plan you want over 100 TB of raw text.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source", "n_chars", normalize_text(F.col("text")).alias("norm")
    )
    corpus = base.filter(F.col("doc_id") % 10 != 0)

    # 1. exact dedup: keep the lowest doc_id per content digest
    wdig = Window.partitionBy(F.md5("norm"))
    deduped = (
        corpus.withColumn("__keep", F.min("doc_id").over(wdig) == F.col("doc_id"))
        .filter("__keep")
        .drop("__keep")
    )

    # 2. quality gate — metrics behind an inline() Generate barrier so the
    #    interpreted lambdas run once per row (see text_quality_gopher)
    toks = F.filter(F.split(F.col("norm"), " "), lambda x: x != "")
    qm = F.element_at(
        F.transform(
            F.array(toks),
            lambda w: F.struct(
                F.size(w).alias("n_words"),
                top_token_count(w).alias("top_cnt"),
                F.size(
                    F.array_intersect(
                        F.array_distinct(w),
                        F.array(*[F.lit(s) for s in STOPWORDS]),
                    )
                ).alias("n_stop"),
            ),
        ),
        1,
    )
    qual = (
        deduped.select("doc_id", "source", "n_chars", "norm", F.inline(F.array(qm)))
        .filter(
            F.col("n_words").between(20, 90)
            & (F.col("n_stop") >= 2)
            & (F.col("top_cnt") / F.col("n_words") <= 0.12)
        )
        # qual feeds BOTH the contamination branch and the kept anti-join.
        # A localCheckpoint here was A/B-measured in r11 (interleaved
        # fresh-process warm, 3 rounds) and REJECTED: 2.05/3.31/2.09 s
        # without vs 2.58/8.34/2.60 s with — unlike curation_pipeline_v2's
        # r10 nest, the duplicated subtrees here are identical up to the
        # md5-dedup Exchange, which AQE's shuffle-stage reuse already
        # computes once at runtime; only the post-shuffle window+quality
        # projection re-runs, and the checkpoint's materialization barrier
        # costs more than that re-run.
    )

    # 3. decontamination vs the held-out eval split (broadcast gram set)
    shingles5 = word_shingles(F.col("norm"), k=5)
    eval_grams = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(shingles5).alias("g"))
        .distinct()
    )
    contaminated = (
        qual.select("doc_id", F.explode(shingles5).alias("g"))
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id")
        .distinct()
    )
    kept = qual.join(contaminated, "doc_id", "left_anti")

    # 4. deterministic split + 5. greedy packing + 6. corpus stats
    bucket = hash60(F.col("doc_id").cast("string"), seed=42) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    wp = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        kept.withColumn("split", split)
        .withColumn("cum", F.sum("n_chars").over(wp))
        .withColumn("pack_id", F.expr("(cum - 1) div 2048"))
    )
    return (
        packed.groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("pack_id").alias("n_packs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "source")
    )
