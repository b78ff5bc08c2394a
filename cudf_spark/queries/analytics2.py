"""Analytics, part 2 — round-5 continuation: classical-statistics and
ML-training primitives the registry didn't yet cover.

- ``stats_anova_oneway``: one-way ANOVA F statistic across the return-flag
  groups — the k-sample generalisation of the existing Welch t / U / KS
  testing family. Exact BIGINT power sums per group, then the
  between/within decomposition folded over the K-row group table in
  SORTED group order on BOTH engines (Spark ``aggregate`` over
  ``array_sort(collect_list(...))``, DuckDB ``sum(... ORDER BY ...)``) so
  the double accumulation order is identical — the same sorted-fold
  discipline emb_outlier_zscore uses. Scale: one map-side-combinable
  groupBy; the fold runs over K rows (K = #groups), never over data.

- ``ml_naive_bayes_train``: multinomial Naive Bayes TRAINING over the
  documents corpus (class = lang) — the classic scalable text classifier
  trained exactly the way a 100 TB pipeline must: token counts are ONE
  keyed (lang, token) groupBy (map-side combinable), class totals and the
  vocabulary size are aggregates OVER THE COUNT TABLE (vocab-grain, never
  a second corpus scan), and add-one-smoothed log P(token|class) is pure
  arithmetic on exact BIGINT counts. Output = top-10 tokens per class by
  count (deterministic token tiebreak) with their smoothed log-probs —
  the model head a downstream classifier would broadcast.

- ``win_bollinger_bands``: per-user 20-event Bollinger bands over the
  events stream (rolling mean ± 2σ + outside-band flag) — cudf Rolling
  parity (python/cudf/cudf/core/window/rolling.py) for the mean/std pair
  on one frame. Values are quantized to exact integer cents BEFORE the
  window so the frame sums are exact BIGINTs on both engines (a sliding
  DOUBLE sum would differ: DuckDB's segment tree vs Spark's running fold
  associate differently); the mean/σ arithmetic is the identical IEEE
  tree on equal integers. Keyed window (user_id), never global.

- ``misc_rle_encode``: segmented run-length encoding of the return-flag
  sequence within each order (gaps-and-islands) — the columnar RLE the
  reference implements at the format layer (cpp/src/io/orc/stripe_data.cu
  RLE runs; dictionary/run encodings in parquet) surfaced as a queryable
  operator: lag-change flag -> running run id -> per-run aggregate, all
  inside one keyed window partition (l_orderkey), so 100 TB parallelism
  is by order key and no run ever crosses a partition boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register
from cudf_spark.queries.text import SQL_TOKS


@register(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
        SELECT l_returnflag AS flag,
               CAST(count(*) AS BIGINT)      AS ng,
               CAST(sum(q) AS BIGINT)        AS s1,
               CAST(sum(q * q) AS BIGINT)    AS s2
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
              FROM lineitem) t
        GROUP BY l_returnflag
    ), folded AS (
        SELECT CAST(count(*) AS INT)        AS k,
               CAST(sum(ng) AS BIGINT)      AS n,
               CAST(sum(s1) AS BIGINT)      AS gs1,
               CAST(sum(s2) AS BIGINT)      AS gs2,
               -- double accumulation in sorted group order == Spark's
               -- aggregate() fold over array_sort(collect_list(...))
               sum(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / ng
                   ORDER BY flag)           AS t1
        FROM g
    )
    SELECT k, n,
           round(t1 - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / n, 6)
               AS ss_between_q6,
           round(CAST(gs2 AS DOUBLE) - t1, 6) AS ss_within_q6,
           CASE WHEN k > 1 AND n > k
                     AND CAST(gs2 AS DOUBLE) - t1 > 0 THEN
               round(((t1 - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / n)
                          / (k - 1))
                     / ((CAST(gs2 AS DOUBLE) - t1) / (n - k)), 6)
           END AS f_stat_q6,
           CASE WHEN CAST(gs2 AS DOUBLE)
                     - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / n > 0 THEN
               round((t1 - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / n)
                     / (CAST(gs2 AS DOUBLE)
                        - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / n), 6)
           END AS eta_sq_q6
    FROM folded
    """,
    doc="one-way ANOVA across the l_returnflag groups (k-sample mean "
    "equality; completes the t/U/chi-square/KS testing family): ONE "
    "map-side-combinable groupBy collects exact BIGINT (n, sum, sumsq) "
    "per group; SS_between needs sum_g(s1_g^2/n_g), a DOUBLE sum over "
    "K group rows, folded in SORTED flag order on both engines (Spark "
    "aggregate() over array_sort(collect_list), DuckDB sum(ORDER BY)) so "
    "the accumulation order — hence every last ULP — is identical. "
    "Integer sums (n, s1, s2) are order-free. s1 is cast to DOUBLE "
    "before squaring, so nothing overflows at any row count. Degenerate "
    "inputs (k<=1, n<=k, zero within-variance) yield NULL F on both "
    "engines, never an ANSI divide-by-zero.",
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    g = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    # per-group double term, folded in sorted flag order (struct sorts by
    # its first field; flags are distinct so the order is total)
    term = F.struct(
        F.col("flag").alias("flag"),
        (F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("ng")).alias(
            "t"
        ),
    )
    folded = g.agg(
        F.count(F.lit(1)).cast("int").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("s1").alias("gs1"),
        F.sum("s2").alias("gs2"),
        F.aggregate(
            F.array_sort(F.collect_list(term)),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("t1"),
    )
    k, n = F.col("k"), F.col("n")
    gs1d = F.col("gs1").cast("double")
    gs2d = F.col("gs2").cast("double")
    t1 = F.col("t1")
    ssb = t1 - gs1d * gs1d / n
    ssw = gs2d - t1
    sst = gs2d - gs1d * gs1d / n
    return folded.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between_q6"),
        F.round(ssw, 6).alias("ss_within_q6"),
        F.when(
            (k > 1) & (n > k) & (ssw > 0),
            F.round((ssb / (k - 1)) / (ssw / (n - k)), 6),
        ).alias("f_stat_q6"),
        F.when(sst > 0, F.round(ssb / sst, 6)).alias("eta_sq_q6"),
    )


@register(
    "ml_naive_bayes_train",
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest(list_filter({SQL_TOKS}, t -> t != '')) AS token
        FROM documents
    ), cnt AS (
        SELECT lang, token, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY lang, token
    ), tot AS (
        SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY lang
    ), vocab AS (
        SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM cnt
    ), ranked AS (
        SELECT lang, token, c,
               CAST(row_number() OVER (
                   PARTITION BY lang ORDER BY c DESC, token) AS INT) AS rnk
        FROM cnt
    )
    SELECT r.lang, r.rnk, r.token, r.c,
           round(ln((CAST(r.c AS DOUBLE) + 1.0)
                    / (CAST(t.tot AS DOUBLE) + vocab.v)), 6) AS logprob_q6
    FROM ranked r JOIN tot t ON r.lang = t.lang, vocab
    WHERE r.rnk <= 10
    ORDER BY r.lang, r.rnk
    """,
    doc="multinomial Naive Bayes training head (class = lang, add-one "
    "smoothing — the classic linear-scan text classifier): token counts "
    "are ONE keyed (lang, token) groupBy over the corpus; class totals "
    "and the vocabulary size aggregate the COUNT TABLE (vocab-grain — "
    "the corpus is scanned exactly once); log P(token|class) = "
    "ln((c+1)/(tot_class+V)) is pure arithmetic on exact BIGINT counts "
    "(identical IEEE tree both engines, round 6). The top-10-per-class "
    "rank window runs over the vocab-grain aggregate partitioned by "
    "class — bounded by vocabulary size, never corpus size. Beyond-"
    "reference pipeline operator (SURVEY 2.14); the tokenizer is the "
    "shared nvtext-parity normalize+split (cpp/src/text/tokenize.cu).",
)
def ml_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import normalize_text, tokenize

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(tokenize(normalize_text(F.col("text"))), lambda t: t != "")
        ).alias("token"),
    )
    cnt = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tot"))
    vocab = cnt.agg(F.countDistinct("token").cast("bigint").alias("v"))
    ranked = cnt.withColumn(
        "rnk",
        F.row_number()
        .over(W.partitionBy("lang").orderBy(F.desc("c"), "token"))
        .cast("int"),
    ).filter(F.col("rnk") <= 10)
    return (
        ranked.join(F.broadcast(tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "rnk",
            "token",
            "c",
            F.round(
                F.log(
                    (F.col("c").cast("double") + F.lit(1.0))
                    / (F.col("tot").cast("double") + F.col("v"))
                ),
                6,
            ).alias("logprob_q6"),
        )
        .orderBy("lang", "rnk")
    )


@register(
    "win_bollinger_bands",
    oracle="""
    WITH v AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS uts,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ), win AS (
        SELECT event_id, user_id, vc,
               CAST(count(*) OVER w AS BIGINT)       AS nw,
               CAST(sum(vc) OVER w AS BIGINT)        AS s1,
               CAST(sum(vc * vc) OVER w AS BIGINT)   AS s2
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY uts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, CAST(nw AS INT) AS nw,
           round(CAST(s1 AS DOUBLE) / nw / 100, 6) AS mid_q6,
           round((CAST(s1 AS DOUBLE) / nw
                  + 2 * sqrt(greatest(
                        (CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nw) / nw,
                        0.0))) / 100, 6) AS upper_q6,
           round((CAST(s1 AS DOUBLE) / nw
                  - 2 * sqrt(greatest(
                        (CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nw) / nw,
                        0.0))) / 100, 6) AS lower_q6,
           CAST(CASE WHEN nw >= 20 AND abs(CAST(vc AS DOUBLE)
                          - CAST(s1 AS DOUBLE) / nw)
                     > 2 * sqrt(greatest(
                           (CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / nw)
                               / nw,
                           0.0))
                THEN 1 ELSE 0 END AS INT) AS outside
    FROM win
    ORDER BY user_id, event_id
    """,
    doc="per-user 20-event Bollinger bands (rolling mean +/- 2 sigma + "
    "outside-band flag; cudf Rolling mean/std parity, python/cudf/cudf/"
    "core/window/rolling.py, on ONE frame): values quantized to exact "
    "integer cents BEFORE the window so the frame count/sum/sumsq are "
    "exact BIGINTs — a sliding DOUBLE sum would diverge across engines "
    "(segment-tree vs running-fold association). Population sigma from "
    "the identical IEEE tree on equal integers; greatest(.,0) absorbs "
    "the -ulp a constant window can produce; the flag only fires on "
    "full 20-row windows. The window is keyed by user_id — at 100 TB "
    "parallelism is per-user, no global sort; ordering is (ts, event_id) "
    "with ts at microsecond grain on both engines (oracle CASTs the "
    "parquet ns timestamp down to Spark's truncation).",
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    win = ev.select(
        "event_id",
        "user_id",
        "vc",
        F.count(F.lit(1)).over(w).cast("bigint").alias("nw"),
        F.sum("vc").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).over(w).cast("bigint").alias("s2"),
    )
    nw = F.col("nw")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / nw
    sigma = F.sqrt(F.greatest((s2d - s1d * s1d / nw) / nw, F.lit(0.0)))
    return win.select(
        "event_id",
        "user_id",
        nw.cast("int").alias("nw"),
        F.round(mean / 100, 6).alias("mid_q6"),
        F.round((mean + 2 * sigma) / 100, 6).alias("upper_q6"),
        F.round((mean - 2 * sigma) / 100, 6).alias("lower_q6"),
        F.when(
            (nw >= 20) & (F.abs(F.col("vc").cast("double") - mean) > 2 * sigma),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("outside"),
    ).orderBy("user_id", "event_id")


@register(
    "misc_rle_encode",
    oracle="""
    WITH marked AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CASE WHEN lag(l_returnflag) OVER w IS DISTINCT FROM
                         l_returnflag THEN 1 ELSE 0 END AS chg
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_returnflag)
    ), runs AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(sum(chg) OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_returnflag) AS INT) AS run_id
        FROM marked
    )
    SELECT l_orderkey, run_id,
           min(l_returnflag)                     AS flag,
           CAST(count(*) AS BIGINT)              AS run_len,
           CAST(min(l_linenumber) AS BIGINT)     AS start_ln
    FROM runs
    GROUP BY l_orderkey, run_id
    ORDER BY l_orderkey, run_id
    """,
    doc="segmented run-length encoding (gaps-and-islands) of the return-"
    "flag sequence within each order: lag-change marker -> running run "
    "id -> per-run (value, length, start) aggregate. This surfaces the "
    "RLE the reference implements at the storage layer (ORC RLE runs, "
    "cpp/src/io/orc/stripe_data.cu; parquet RLE/dictionary pages) as a "
    "queryable operator — the building block for compressing sorted "
    "columns and for island analyses (status stretches, sensor plateaus). "
    "The sequence order is (l_linenumber, l_returnflag) — line numbers repeat within an order in the fixtures, so the flag tiebreak makes the segmentation total and engine-independent (equal-flag ties are interchangeable and cannot move a run boundary). Everything is keyed by l_orderkey: the change flag, the running "
    "sum, and the final groupBy share ONE hash partitioning (a single "
    "shuffle, AQE-coalesced), and no run can cross a partition because "
    "runs live inside an order. At 100 TB the segment key bounds window "
    "state to one order's lines.",
)
def misc_rle_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_returnflag")
    marked = li.withColumn(
        "chg",
        F.when(
            ~F.lag("l_returnflag").over(w).eqNullSafe(F.col("l_returnflag")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn("run_id", F.sum("chg").over(w).cast("int"))
    return (
        runs.groupBy("l_orderkey", "run_id")
        .agg(
            F.min("l_returnflag").alias("flag"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
            F.min("l_linenumber").cast("bigint").alias("start_ln"),
        )
        .orderBy("l_orderkey", "run_id")
    )
