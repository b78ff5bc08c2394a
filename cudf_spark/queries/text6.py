"""Text pipeline, part 6 — model-based quality filtering and link-graph
document ranking.

``text_quality_classifier`` applies a *trained linear model* (fixed
weights over engineered features) the way production corpora apply a
fastText quality classifier (CCNet, Wenzek et al. 2020 arXiv:1911.00359;
GPT-3's quality filter, Brown et al. 2020 §A.2 — public literature):
heuristic gates (text.py's ``text_quality_gopher``) drop garbage, the
classifier *scores* the remainder for sampling weights. Inference is a
pure Catalyst projection — at 100 TB this is a map-only pass, no shuffle
at all until the final bounded ordering; swap the literal weights for a
broadcast weight table when the model grows beyond a handful of features.

Float discipline: features are rationals over integer counts; the logit
is floor-quantized (not rounded) to 6 decimals because its rational
values CAN land on exact decimal midpoints where Spark's HALF_UP on the
decimal repr and DuckDB's binary half-even diverge; floor of the
identical double cannot diverge.

Reference scope: beyond nvtext (signals only); pipeline logic the
reference leaves to callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.queries.registry import register
from cudf_spark.queries.text import SQL_SHINGLES, SQL_TOKS, STOPWORDS
from cudf_spark.functions.textfns import normalize_text
from cudf_spark.queries.pipeline import (
    sqrt_temperature_tot_sql,
    sqrt_temperature_total,
)

# Fixed "trained" weights: bias, n_tok saturation, stopword ratio, alpha
# fraction, mean token length (capped), digit fraction. Signs follow the
# published feature directions (stopword-rich prose good, digit-heavy bad).
W0, W_LEN, W_STOP, W_ALPHA, W_TOKLEN, W_DIGIT = -2.6, 1.5, 2.0, 1.8, 0.7, -2.5


def _quality_z(d: DataFrame) -> DataFrame:
    """(doc_id, n_tok, z): the trained-linear-model logit — shared by the
    standalone classifier query and curation_pipeline_v3's gate."""
    toks = F.filter(F.split(normalize_text(F.col("text")), " "), lambda x: x != "")
    d = d.select(
        "doc_id",
        "text",
        F.size(toks).alias("n_tok"),
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).alias("tok_chars"),
        # reuse `toks` — a second normalize_text+split here is not
        # CSE'd by Catalyst, doubling the regex work of this map-only
        # pass ("" can't be a stopword, so the filtered array is fine)
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in STOPWORDS]),
            )
        ).alias("n_stop"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digit"),
        F.length("text").alias("n_char"),
    )
    # empty docs: ratio features score 0 instead of ANSI DIVIDE_BY_ZERO
    safe_tok = F.when(
        F.col("n_tok") == 0, F.lit(0.0)
    )
    safe_char = F.when(F.col("n_char") == 0, F.lit(0.0))
    z = (
        F.lit(W0)
        + W_LEN * F.least(F.col("n_tok") / 100.0, F.lit(1.0))
        + W_STOP * safe_tok.otherwise(F.col("n_stop") / F.col("n_tok"))
        + W_ALPHA * safe_char.otherwise(F.col("n_alpha") / F.col("n_char"))
        + W_TOKLEN
        * safe_tok.otherwise(
            F.least(F.col("tok_chars") / F.col("n_tok") / 10.0, F.lit(1.0))
        )
        + W_DIGIT * safe_char.otherwise(F.col("n_digit") / F.col("n_char"))
    )
    return d.select("doc_id", "n_tok", z.alias("z"))


# Shared classifier CTEs (the gate stage of curation_pipeline_v3 replays
# the identical SQL).
_QUALITY_CTES = f"""feats AS (
        SELECT doc_id,
               len(list_filter({SQL_TOKS}, x -> x != ''))           AS n_tok,
               list_sum(list_transform(list_filter({SQL_TOKS}, x -> x != ''),
                                       x -> length(x)))             AS tok_chars,
               len(list_intersect(list_distinct({SQL_TOKS}),
                   ['the', 'a', 'of', 'to', 'and']))                AS n_stop,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g'))   AS n_alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g'))      AS n_digit,
               length(text)                                         AS n_char
        FROM documents),
    scored AS (
        -- empty docs (n_tok=0 or n_char=0) score their ratio features
        -- as 0 rather than dividing by zero (Spark ANSI mode throws)
        SELECT doc_id, n_tok,
               {W0}
               + {W_LEN}    * least(n_tok / 100.0, 1.0)
               + {W_STOP}   * (CASE WHEN n_tok = 0 THEN 0.0
                                    ELSE n_stop * 1.0 / n_tok END)
               + {W_ALPHA}  * (CASE WHEN n_char = 0 THEN 0.0
                                    ELSE n_alpha * 1.0 / n_char END)
               + {W_TOKLEN} * (CASE WHEN n_tok = 0 THEN 0.0
                                    ELSE least(tok_chars * 1.0 / n_tok / 10.0, 1.0) END)
               + {W_DIGIT}  * (CASE WHEN n_char = 0 THEN 0.0
                                    ELSE n_digit * 1.0 / n_char END) AS z
        FROM feats)"""


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH {_QUALITY_CTES}
    SELECT doc_id, n_tok,
           CAST(floor(z * 1000000) AS BIGINT) AS logit_q6,
           z > 0                              AS keep
    FROM scored ORDER BY doc_id
    """,
    doc="linear quality classifier (CCNet/GPT-3-style model-based "
    "filtering): engineered features -> fixed-weight logit -> keep "
    "decision. Map-only inference; the floor-quantized logit is the "
    "sampling weight downstream mixers consume.",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        _quality_z(d)
        .select(
            "doc_id",
            "n_tok",
            F.floor(F.col("z") * 1000000).cast("long").alias("logit_q6"),
            (F.col("z") > 0).alias("keep"),
        )
        # checkpoint before the sort: the range-sampling pass would run
        # the per-doc feature+logit projection twice (r11 §3.14 class,
        # see text_quality_score)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )


PR_ITERS, PR_D = 5, 0.85


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration FIXED-POINT PageRank over the symmetrized
    user↔event_type click graph; mirrors
    operators.graphs.pagerank_fixed_point exactly (same scaled-integer
    init, damping 17/20, truncating integer division, fixed rounds).
    Integer sums are fold-order independent, so both engines are
    bit-identical — no ULP knife edge at the quantization boundary."""
    from cudf_spark.operators.graphs import PR_FP_SCALE

    s = PR_FP_SCALE
    head = f"""
    e AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
                 't:' || event_type AS dst FROM events),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    pr0 AS (SELECT deg.src AS node, CAST({s} AS BIGINT) // nn.n AS pr_q
            FROM deg CROSS JOIN nn)"""
    steps = []
    for k in range(PR_ITERS):
        steps.append(f"""
    c{k + 1} AS (SELECT sym.dst AS node, sum(pr{k}.pr_q // deg.deg) AS m
           FROM sym JOIN pr{k} ON sym.src = pr{k}.node
                    JOIN deg ON sym.src = deg.src
           GROUP BY sym.dst),
    pr{k + 1} AS (SELECT deg.src AS node,
                  CAST((CAST({s} AS BIGINT) - CAST({s} AS BIGINT) * 17 // 20) // nn.n
                       + (17 * coalesce(c{k + 1}.m, 0)) // 20 AS BIGINT) AS pr_q
           FROM deg CROSS JOIN nn
           LEFT JOIN c{k + 1} ON deg.src = c{k + 1}.node)""")
    return (
        "WITH " + ",".join([head, *steps]) + f"""
    SELECT node, pr_q // 100000000 AS pr_q7
    FROM pr{PR_ITERS}
    ORDER BY pr_q7 DESC, node
    LIMIT 10
    """
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="link-graph quality prior: 5-iteration PageRank (d=0.85) over the "
    "symmetrized user<->event_type bipartite click graph — the 'rank by "
    "how the graph links to it' signal corpus pipelines mix into sampling "
    "weights. Each round is one keyed edge-rank join + one keyed "
    "contribution sum (operators/graphs.py:pagerank_fixed_point), "
    "lineage truncated per round; the oracle unrolls the identical five "
    "rounds as CTEs. The ENTIRE iteration runs in scaled-integer "
    "(1e-15-unit) arithmetic: integer sums are fold-order independent, "
    "so both engines are bit-identical at any scale — no ULP knife edge "
    "at the quantization boundary, and no sort-fold (whose collect_list "
    "is unbounded on hot nodes).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.graphs import pagerank_fixed_point

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank_fixed_point(sym, damping_num=17, damping_den=20, iters=PR_ITERS)
    return (
        pr.select("node", F.expr("pr_q div 100000000").alias("pr_q7"))
        .orderBy(F.col("pr_q7").desc(), "node")
        .limit(10)
    )


SPARSE_MAX_DF = 10  # drop tokens in more than 1/SPARSE_MAX_DF of docs (relative stop-token blocking)
SPARSE_MIN_COS = 0.5


@register(
    "text_sparse_cosine_pairs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_TOKS}) AS t FROM documents),
    tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    w AS (
        SELECT tf.doc_id, tf.t, tf.tf * n.n_docs * 1.0 / dfreq.df AS w
        FROM tf JOIN dfreq USING (t) CROSS JOIN n
        WHERE dfreq.df * {SPARSE_MAX_DF} <= n.n_docs),
    -- SORTED folds (the repo's float-sum discipline): dotp and nrm feed
    -- the >= threshold, so an unordered double sum could flip a pair
    -- within an ulp of the boundary between engines
    nrm AS (SELECT doc_id,
                   sqrt(list_reduce(list_sort(list(w * w)), (x, y) -> x + y))
                       AS nrm
            FROM w GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               list_reduce(list_sort(list(a.w * b.w)), (x, y) -> x + y) AS dotp
        FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT p.id_a, p.id_b,
           round(p.dotp / (na.nrm * nb.nrm), 6) AS cosine
    FROM pairs p JOIN nrm na ON na.doc_id = p.id_a
                 JOIN nrm nb ON nb.doc_id = p.id_b
    WHERE p.dotp / (na.nrm * nb.nrm) >= {SPARSE_MIN_COS}
    ORDER BY id_a, id_b
    """,
    doc="sparse TF-IDF cosine similarity join: docs become sparse "
    "token->weight vectors (rational tf*N/df — no libm ln), pairs form "
    "ONLY through shared tokens (token-keyed self-join), with a "
    f"RELATIVE document-frequency cap (df <= n_docs/{SPARSE_MAX_DF}, "
    "sklearn max_df style — an absolute cap stops scaling: at 10x the "
    "corpus every shared token exceeds it) excising hot tokens — the "
    "blocking that keeps the pair term near-linear instead of quadratic "
    "(every similarity-join system's trick: common tokens carry no "
    "signal AND create the blowup). Norms/dot folds are groupBy sums, "
    "rounded; at 100 TB the weight table is the only large intermediate "
    "and every shuffle is token- or doc-keyed.",
)
def text_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import tokenize

    d = load(spark, sf_dir, "documents")
    n_docs = d.groupBy().agg(F.count("*").alias("n_docs"))
    tok = d.select("doc_id", F.explode(tokenize(normalize_text(F.col("text")))).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    # RELATIVE cap (sklearn max_df=0.1 style) applied to dfreq BEFORE the
    # tf join: the full distinct-token table is 10^8-10^9 rows on a web
    # corpus (typos/URLs/ids) — a mandatory broadcast of it is an OOM.
    # Post-cap only the surviving vocabulary ships; no broadcast hint —
    # both sides are token-keyed, so AQE picks broadcast iff the kept
    # vocab actually fits, else a plain keyed shuffle join. (An absolute
    # cap stops scaling — at 10x the corpus every shared token exceeds
    # it and the join finds nothing; observed at sf0.1 with a cap of 40.)
    dfreq_kept = dfreq.crossJoin(F.broadcast(n_docs)).filter(
        F.col("df") * SPARSE_MAX_DF <= F.col("n_docs")
    )
    # weight table feeds three consumers (norms + both join sides):
    # materialize once, as the tfidf query does
    w = (
        tf.join(dfreq_kept, "t")
        .select("doc_id", "t", (F.col("tf") * F.col("n_docs") / F.col("df")).alias("w"))
        .localCheckpoint(eager=False)
    )
    # SORTED folds: dotp/nrm feed the >= threshold, so unordered double
    # sums could flip a boundary pair between engines (oracle mirrors
    # with list_reduce(list_sort(...)))
    sorted_sum = lambda c: F.aggregate(
        F.array_sort(F.collect_list(c)), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(sorted_sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "t", F.col("w").alias("wb"))
    pairs = (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(sorted_sum(F.col("wa") * F.col("wb")).alias("dotp"))
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = F.col("dotp") / (F.col("na") * F.col("nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cos >= SPARSE_MIN_COS)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


CONT_MAX_DF = 10   # relative df cap: drop shingles in > 1/10 of docs
CONT_MIN_Q6 = 600_000  # emit pairs with containment >= 0.6 in either direction


def _doc_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, g): exploded distinct 3-shingles of each doc."""
    from cudf_spark.functions.textfns import word_shingles

    return d.select(
        "doc_id", F.explode(word_shingles(normalize_text(F.col("text")))).alias("g")
    )


def _containment_pairs(sh: DataFrame, n_docs: DataFrame) -> DataFrame:
    """(id_a, id_b, inter, sz_a, sz_b, cont_ab_q6, cont_ba_q6) for pairs
    above CONT_MIN_Q6 in either direction — shared by the standalone
    query and curation_pipeline_v3's asymmetric-dedup stage. ``sh`` is a
    (doc_id, g) shingle table, ``n_docs`` a 1-row corpus count."""
    gf = sh.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    kept_g = (
        gf.crossJoin(F.broadcast(n_docs))  # 1-row count
        .filter(F.col("df") * CONT_MAX_DF <= F.col("n_docs"))
        .select("g")
    )
    kept = sh.join(kept_g, "g").localCheckpoint(
        eager=False
    )  # feeds sizes + both join sides
    sz = kept.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    a = kept.select(F.col("doc_id").alias("id_a"), "g")
    b = kept.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    cont_ab = F.expr("(inter * 1000000) div sz_a")
    cont_ba = F.expr("(inter * 1000000) div sz_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter((cont_ab >= CONT_MIN_Q6) | (cont_ba >= CONT_MIN_Q6))
        .select(
            "id_a", "id_b", "inter", "sz_a", "sz_b",
            cont_ab.alias("cont_ab_q6"),
            cont_ba.alias("cont_ba_q6"),
        )
    )


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES}) AS g FROM w),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    gf AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY g),
    kept AS (
        SELECT sh.doc_id, sh.g
        FROM sh JOIN gf USING (g) CROSS JOIN nn
        WHERE gf.df * {CONT_MAX_DF} <= nn.n_docs),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM kept GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           (i.inter * 1000000) // sa.sz AS cont_ab_q6,
           (i.inter * 1000000) // sb.sz AS cont_ba_q6
    FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
                 JOIN sz sb ON sb.doc_id = i.id_b
    WHERE (i.inter * 1000000) // sa.sz >= {CONT_MIN_Q6}
       OR (i.inter * 1000000) // sb.sz >= {CONT_MIN_Q6}
    ORDER BY id_a, id_b
    """,
    doc="ASYMMETRIC near-dup detection via shingle containment "
    "|A∩B|/|A| (Broder 1997's containment — catches a short doc quoted "
    "inside a long one, which symmetric Jaccard/minhash under-scores "
    "because the union is dominated by the long doc). Pairs form ONLY "
    "through shared shingles (shingle-keyed self-join) under the same "
    "relative-df blocking as the sparse-cosine join; containment is "
    "reported in exact integer micro-units ((inter*1e6) div |set|) so "
    "both engines agree with no float division anywhere. 100 TB: "
    "shingle- and doc-keyed shuffles only; hot shingles are excised by "
    "the cap before the pair term can go quadratic.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_docs = d.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        _containment_pairs(_doc_shingles(d), n_docs)
        .select("id_a", "id_b", "cont_ab_q6", "cont_ba_q6")
        .orderBy("id_a", "id_b")
    )


@register(
    "text_novelty_ratio",
    oracle=f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES}) AS g FROM w),
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
    per AS (
        SELECT sh.doc_id,
               CAST(count(*) AS BIGINT) AS n_sh,
               CAST(count(*) FILTER (f.first_doc = sh.doc_id) AS BIGINT) AS n_novel
        FROM sh JOIN firsts f USING (g)
        GROUP BY sh.doc_id)
    SELECT doc_id, n_sh, n_novel,
           (n_novel * 1000000) // n_sh AS novelty_q6
    FROM per ORDER BY doc_id
    """,
    doc="corpus novelty scoring: per-doc fraction of 3-gram shingles "
    "whose FIRST corpus occurrence (min doc_id over the ingest order) is "
    "this doc — the 'how much new text does this doc add' signal "
    "curation pipelines use to downweight boilerplate-heavy additions "
    "(the aggregate view of win_cumulative_distinct's first-occurrence "
    "rewrite). One shingle-keyed min + one doc-keyed count; ratio in "
    "exact integer micro-units. Docs with < 3 tokens have no shingles "
    "and are absent on both engines (explode/unnest drop empty arrays).",
)
def text_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import word_shingles

    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(word_shingles(normalize_text(F.col("text")))).alias("g")
    )
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sh"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_sh",
        "n_novel",
        F.expr("(n_novel * 1000000) div n_sh").alias("novelty_q6"),
    ).orderBy("doc_id")


@register(
    "curation_pipeline_v3",
    oracle=f"""
    WITH {_QUALITY_CTES},
    gated AS (SELECT doc_id FROM scored WHERE z > 0),
    w AS (SELECT d.doc_id, {SQL_TOKS} AS w
          FROM documents d JOIN gated USING (doc_id)),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES}) AS g FROM w),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM gated),
    gf AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY g),
    keptg AS (
        SELECT sh.doc_id, sh.g
        FROM sh JOIN gf USING (g) CROSS JOIN nn
        WHERE gf.df * {CONT_MAX_DF} <= nn.n_docs),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM keptg GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        FROM keptg a JOIN keptg b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT i.id_a, i.id_b, sa.sz AS sz_a, sb.sz AS sz_b
        FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
                     JOIN sz sb ON sb.doc_id = i.id_b
        WHERE (i.inter * 1000000) // sa.sz >= {CONT_MIN_Q6}
           OR (i.inter * 1000000) // sb.sz >= {CONT_MIN_Q6}),
    losers AS (
        -- the SMALLER kept-shingle set loses (its content is the one
        -- contained); ties drop the larger doc_id — single-pass,
        -- deterministic
        SELECT DISTINCT CASE WHEN sz_a < sz_b THEN id_a
                             WHEN sz_b < sz_a THEN id_b
                             ELSE greatest(id_a, id_b) END AS doc_id
        FROM pairs),
    survivors AS (
        SELECT g.doc_id FROM gated g ANTI JOIN losers l ON g.doc_id = l.doc_id),
    sh2 AS (SELECT sh.doc_id, sh.g FROM sh JOIN survivors USING (doc_id)),
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM sh2 GROUP BY g),
    nov AS (
        SELECT sh2.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
               CAST(count(*) FILTER (f.first_doc = sh2.doc_id) AS BIGINT) AS n_novel
        FROM sh2 JOIN firsts f USING (g)
        GROUP BY sh2.doc_id),
    src AS (
        SELECT d.source, (n.n_novel * 1000000) // n.n_sh AS novelty_q6
        FROM nov n JOIN documents d USING (doc_id)),
    agg AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(novelty_q6) // count(*) AS BIGINT) AS mean_novelty_q6
        FROM src GROUP BY source),
    tot AS (SELECT {sqrt_temperature_tot_sql('n_kept')} AS tot FROM agg)
    SELECT agg.source, agg.n_kept, agg.mean_novelty_q6,
           CAST(floor(sqrt(agg.n_kept) / tot.tot * 1000000) AS BIGINT) AS weight_q6
    FROM agg CROSS JOIN tot
    ORDER BY agg.source
    """,
    doc="End-to-end curation v3 — the ROUND-5 operators composed into one "
    "DAG: linear quality gate (z > 0, _quality_z) -> asymmetric "
    "containment dedup (the contained/smaller side of each >= 0.6 pair "
    "is dropped, single deterministic pass) -> corpus novelty scoring "
    "over the survivors (first-occurrence shingles) -> per-source "
    "rollup with sqrt-temperature sampling weights. Every stage is the "
    "already-verified standalone operator (shared helpers _quality_z / "
    "_doc_shingles / _containment_pairs), every shuffle keyed (doc_id / "
    "shingle / source), all arithmetic on integer or IEEE-sqrt-exact "
    "lattices. Docs with < 3 tokens have no shingles and leave the "
    "pipeline at the novelty stage on both engines.",
)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # checkpoint the gate (doc_id-only, ~|docs|/2 rows): it feeds the
    # corpus count, the shingle build AND the survivor anti-join — without
    # it the _quality_z regex/tokenize map pass re-nests into all three.
    # r10 A/B at sf0.1: 3.45 -> 3.37 s min-of-3 fresh-process — in-noise
    # locally (the fixture gate is cheap), kept because at 100 TB the
    # removed recompute is 2 extra full-corpus regex/tokenize passes
    # while the added cost is one |docs|/2-row single-column write
    gated_ids = (
        _quality_z(d).filter(F.col("z") > 0).select("doc_id").localCheckpoint(
            eager=False
        )
    )
    gated = d.join(gated_ids, "doc_id")
    n_docs = gated.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # one shingle table feeds BOTH the containment stage and the novelty
    # stage — checkpoint so the tokenizer runs once
    sh = _doc_shingles(gated).localCheckpoint(eager=False)
    pairs = _containment_pairs(sh, n_docs)
    loser = (
        F.when(F.col("sz_a") < F.col("sz_b"), F.col("id_a"))
        .when(F.col("sz_b") < F.col("sz_a"), F.col("id_b"))
        .otherwise(F.greatest("id_a", "id_b"))
    )
    losers = pairs.select(loser.alias("doc_id")).distinct()
    survivors = gated_ids.join(losers, "doc_id", "left_anti")
    sh2 = sh.join(survivors, "doc_id")
    # NOT checkpointed: r10 A/B measured 3.42 vs 3.37 s (neutral-to-
    # worse) — sh is already materialized, so the survivors join is
    # cheap to recompute for its two consumers (the jaccard lesson)
    firsts = sh2.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    nov = (
        sh2.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sh"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    src = nov.join(d.select("doc_id", "source"), "doc_id").select(
        "source", F.expr("(n_novel * 1000000) div n_sh").alias("novelty_q6")
    )
    agg = src.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.expr("sum(novelty_q6) div count(1)").cast("bigint").alias("mean_novelty_q6"),
    )
    tot = sqrt_temperature_total(agg, "n_kept")
    return (
        agg.crossJoin(F.broadcast(tot))  # 1-row total
        .select(
            "source",
            "n_kept",
            "mean_novelty_q6",
            F.floor(F.sqrt(F.col("n_kept").cast("double")) / F.col("tot") * 1e6)
            .cast("bigint")
            .alias("weight_q6"),
        )
        .orderBy("source")
    )
