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
from cudf_spark.queries.text import SQL_TOKS, STOPWORDS
from cudf_spark.functions.textfns import normalize_text

# Fixed "trained" weights: bias, n_tok saturation, stopword ratio, alpha
# fraction, mean token length (capped), digit fraction. Signs follow the
# published feature directions (stopword-rich prose good, digit-heavy bad).
W0, W_LEN, W_STOP, W_ALPHA, W_TOKLEN, W_DIGIT = -2.6, 1.5, 2.0, 1.8, 0.7, -2.5


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH feats AS (
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
        SELECT doc_id, n_tok,
               {W0}
               + {W_LEN}    * least(n_tok / 100.0, 1.0)
               + {W_STOP}   * (n_stop * 1.0 / n_tok)
               + {W_ALPHA}  * (n_alpha * 1.0 / n_char)
               + {W_TOKLEN} * least(tok_chars * 1.0 / n_tok / 10.0, 1.0)
               + {W_DIGIT}  * (n_digit * 1.0 / n_char) AS z
        FROM feats)
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
    toks = F.filter(F.split(normalize_text(F.col("text")), " "), lambda x: x != "")
    d = d.select(
        "doc_id",
        "text",
        F.size(toks).alias("n_tok"),
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).alias("tok_chars"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.split(normalize_text(F.col("text")), " ")),
                F.array(*[F.lit(w) for w in STOPWORDS]),
            )
        ).alias("n_stop"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digit"),
        F.length("text").alias("n_char"),
    )
    z = (
        F.lit(W0)
        + W_LEN * F.least(F.col("n_tok") / 100.0, F.lit(1.0))
        + W_STOP * (F.col("n_stop") / F.col("n_tok"))
        + W_ALPHA * (F.col("n_alpha") / F.col("n_char"))
        + W_TOKLEN * F.least(F.col("tok_chars") / F.col("n_tok") / 10.0, F.lit(1.0))
        + W_DIGIT * (F.col("n_digit") / F.col("n_char"))
    )
    return (
        d.withColumn("z", z)
        .select(
            "doc_id",
            "n_tok",
            F.floor(F.col("z") * 1000000).cast("long").alias("logit_q6"),
            (F.col("z") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


PR_ITERS, PR_D = 5, 0.85


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration PageRank over the symmetrized user↔event_type
    click graph; mirrors operators.graphs.pagerank exactly (same init,
    same damping, same fixed rounds)."""
    head = f"""
    e AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
                 't:' || event_type AS dst FROM events),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    pr0 AS (SELECT deg.src AS node, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn)"""
    steps = []
    for k in range(PR_ITERS):
        steps.append(f"""
    c{k + 1} AS (SELECT sym.dst AS node, sum(pr{k}.pr / deg.deg) AS m
           FROM sym JOIN pr{k} ON sym.src = pr{k}.node
                    JOIN deg ON sym.src = deg.src
           GROUP BY sym.dst),
    pr{k + 1} AS (SELECT deg.src AS node,
                  (1.0 - {PR_D}) / nn.n + {PR_D} * coalesce(c{k + 1}.m, 0.0) AS pr
           FROM deg CROSS JOIN nn
           LEFT JOIN c{k + 1} ON deg.src = c{k + 1}.node)""")
    return (
        "WITH " + ",".join([head, *steps]) + f"""
    SELECT node, CAST(floor(pr * 10000000) AS BIGINT) AS pr_q7
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
    "contribution sum (operators/graphs.py:pagerank), lineage truncated "
    "per round; the oracle unrolls the identical five rounds as CTEs. "
    "Floor-quantized to dodge cross-engine sum-order ULP drift.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.graphs import pagerank

    ev = load(spark, sf_dir, "events")
    e = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(sym, damping=PR_D, iters=PR_ITERS)
    return (
        pr.select("node", F.floor(F.col("pr") * 10000000).cast("long").alias("pr_q7"))
        .orderBy(F.col("pr_q7").desc(), "node")
        .limit(10)
    )
