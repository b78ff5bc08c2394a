"""Analytics, part 3 — round-5 sixteenth block: interval joins, rank
correlation, iterative subgraph refinement, distribution drift, table
health, and storage-encoding estimation.

- ``join_interval_overlap``: the interval-overlap join (s1.start <= s2.end
  AND s2.start <= s1.end) — the one join shape the existing as-of /
  point-in-range family doesn't cover. Spark side uses BIN EXPANSION:
  every session interval explodes into the hour buckets it covers, pairs
  meet on an equi-join over the bucket key, the exact overlap predicate
  then filters, and a distinct collapses pairs found in several shared
  buckets. Two overlapping intervals always share the bucket of any
  overlap instant, so recall is exact. The oracle proves it with the
  direct non-equi join. At 100 TB the bucket key IS the shuffle key (no
  BNLJ anywhere); hot buckets (everyone online at once) are inherent
  interval-join skew — AQE skew-join splits them, and the bucket width is
  the knob that trades expansion factor against per-bucket fan-in.

- ``stats_kendall_tau_binned``: exact Kendall tau-b per group from the
  JOINT VALUE-LATTICE HISTOGRAM — concordant/discordant pairs are
  c1*c2 sums over ordered cell pairs, tie terms come from the x / y
  marginals, all in BIGINT. The single data-scale pass is the histogram
  groupBy; the cell-pair join runs at lattice grain (<=~1k cells per
  group). tau-b itself needs sqrt: both factors (n0-n1), (n0-n2) are cast
  to double separately (each < 2^53 at any plausible per-group n, unlike
  their product) and sqrt is IEEE-exact, so both engines produce
  bit-identical doubles and the floor-quantized digit cannot diverge.

- ``graph_kcore_peel``: 4-round 3-core peeling of the parts-co-ordered
  graph — the iterative subgraph refinement primitive under community
  mining. DEFINED as exactly 4 peel iterations (not to convergence), so
  Spark's Python-side loop and the oracle's 4 nested CTE stages compute
  the identical subgraph with a bounded plan: each round is one endpoint
  explode + keyed degree groupBy + two endpoint-keyed joins; lineage
  stays 4 rounds deep, no checkpoint needed.

- ``text_hellinger_drift``: per-source unigram-distribution drift vs the
  whole corpus as Hellinger affinity — the domain-mix health metric a
  training-data pipeline tracks per crawl slice. Per-token contribution
  sqrt((cs*cg)/(ns*ng)) uses only cast / divide / sqrt, every one of which
  rounds identically on identical inputs in the JVM and DuckDB (sqrt is
  correctly rounded by IEEE-754 — unlike ln, which fused-multiply drift
  bit us in win_ewm_finite_horner), pre-quantized to nano-units AT TOKEN
  GRAIN so the per-source BIGINT sum is reduction-order-free. Global
  counts derive FROM the (source, token) count table — one corpus scan
  total. Precondition (documented): ns*ng must fit 2^53 for the exact
  double cast; at corpus scales beyond that, rescale both counts by a
  common power of two before the ratio.

- ``dq_freshness_gaps``: the table-freshness / completeness monitor every
  warehouse runs against landing tables: per (event_type, day) row
  counts on a gap-filled calendar spine (sequence + explode — missing
  days surface as explicit zero rows), trailing-7-day lower-median
  baseline per type (collect over a 7-row frame, array_sort, rank pick —
  day grain, never event grain), integer staleness rule 2*cnt < median.

- ``misc_bitpack_for_blocks``: frame-of-reference + bit-packing size
  estimator (the parquet/ORC encoding decision surfaced as a query, next
  to misc_rle_encode / misc_delta_zigzag_encode): 64-row blocks within
  each supplier's shipdate-ordered lineitems, per-block reference = min,
  payload width = bit length of (max - min) via length(bin(range)) —
  identical string semantics in Spark and DuckDB — packed size
  64 + n*width bits. Blocks are keyed windows inside the supplier
  partition, so 100 TB parallelism is per supplier and no block crosses
  a partition.

- ``stats_cohens_kappa``: chance-corrected agreement (Cohen 1960) between
  the heuristic language-ID predictor and the labeled lang column — the
  companion to text_lang_confusion_eval's P/R/F1. kappa = (N*agree -
  sum_k row_k*col_k) / (N^2 - sum_k row_k*col_k) is an exact BIGINT
  rational; quantized with truncating integer division (Spark ``div`` ==
  DuckDB ``//``, both toward zero, the recorded cross-engine rule). One
  corpus scan; marginals are class-grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.operators.graphs import co_occurrence_edges
from cudf_spark.queries.registry import register
from cudf_spark.queries.text import _lang_scores_sql

_SESS_GAP_US = 1_800_000_000  # 30-minute session gap rule
_BIN_US = 3_600_000_000  # 1-hour overlap-join buckets

_SESS_SQL = """
    e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        FROM events
    ), o AS (
        SELECT user_id, us,
               lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS p
        FROM e
    ), f AS (
        SELECT user_id, us,
               CASE WHEN p IS NULL OR us - p > 1800000000 THEN 1 ELSE 0 END
                   AS brk
        FROM o
    ), s AS (
        SELECT user_id, us,
               sum(brk) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sn
        FROM f
    ), sess AS (
        SELECT user_id, sn, min(us) AS st, max(us) AS en
        FROM s GROUP BY user_id, sn
    )
"""


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessions as (user_id, sn, st, en) in epoch micros."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    brk = F.when(prev.isNull() | (F.col("us") - prev > _SESS_GAP_US), 1).otherwise(0)
    sn = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("sn", sn)
        .groupBy("user_id", "sn")
        .agg(F.min("us").alias("st"), F.max("us").alias("en"))
    )


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH {_SESS_SQL},
    pairs AS (
        SELECT a.user_id AS u, b.user_id AS v, b.sn AS sn2
        FROM sess a JOIN sess b
          ON a.user_id != b.user_id AND a.st <= b.en AND b.st <= a.en
    )
    SELECT u AS user_id,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(count(DISTINCT v) AS BIGINT) AS n_partners
    FROM pairs GROUP BY u
    ORDER BY n_overlaps DESC, user_id LIMIT 50
    """,
    doc="interval-overlap join via hour-bucket bin expansion: 30-min-gap "
    "sessions per user, pairs of DIFFERENT users' sessions that overlap "
    "in time (s1.st <= s2.en AND s2.st <= s1.en), found on a bucket "
    "equi-join + exact predicate + pair-distinct (a shared bucket always "
    "exists at any overlap instant, so the expansion is lossless). The "
    "oracle's direct non-equi join proves the bucketed plan finds the "
    "identical pair set. Output: top-50 users by directed overlapping-"
    "session count (total order: count desc, user_id).",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _sessions(spark, sf_dir)
    binned = sess.withColumn(
        "bin",
        F.explode(F.expr(f"sequence(st div {_BIN_US}, en div {_BIN_US})")),
    )
    a = binned.select(
        F.col("user_id").alias("u"),
        F.col("sn").alias("sn1"),
        F.col("st").alias("st1"),
        F.col("en").alias("en1"),
        "bin",
    )
    b = binned.select(
        F.col("user_id").alias("v"),
        F.col("sn").alias("sn2"),
        F.col("st").alias("st2"),
        F.col("en").alias("en2"),
        "bin",
    )
    pairs = (
        a.join(b, "bin")
        .filter(
            (F.col("u") != F.col("v"))
            & (F.col("st1") <= F.col("en2"))
            & (F.col("st2") <= F.col("en1"))
        )
        .select("u", "sn1", "v", "sn2")
        .distinct()
    )
    return (
        pairs.groupBy(F.col("u").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
            F.countDistinct("v").cast("bigint").alias("n_partners"),
        )
        .orderBy(F.desc("n_overlaps"), "user_id")
        .limit(50)
    )


@register(
    "stats_kendall_tau_binned",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS y
        FROM lineitem
    ), hist AS (
        SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
        FROM pts GROUP BY flag, x, y
    ), tot AS (
        SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY flag
    ), cd AS (
        SELECT h1.flag,
               CAST(sum(CASE WHEN h2.y > h1.y THEN h1.c * h2.c ELSE 0 END)
                    AS BIGINT) AS nc,
               CAST(sum(CASE WHEN h2.y < h1.y THEN h1.c * h2.c ELSE 0 END)
                    AS BIGINT) AS nd
        FROM hist h1 JOIN hist h2
          ON h2.flag = h1.flag AND h2.x > h1.x
        GROUP BY h1.flag
    ), mx AS (
        SELECT flag, CAST(sum(cx * (cx - 1) / 2) AS BIGINT) AS n1
        FROM (SELECT flag, x, CAST(sum(c) AS BIGINT) AS cx
              FROM hist GROUP BY flag, x)
        GROUP BY flag
    ), my AS (
        SELECT flag, CAST(sum(cy * (cy - 1) / 2) AS BIGINT) AS n2
        FROM (SELECT flag, y, CAST(sum(c) AS BIGINT) AS cy
              FROM hist GROUP BY flag, y)
        GROUP BY flag
    )
    SELECT t.flag, t.n, cd.nc, cd.nd, mx.n1, my.n2,
           -- zero-variance guard: a group with all-tied x (or y) zeroes
           -- the tie-corrected denominator; tau is undefined there and
           -- the Infinity -> BIGINT cast would abort both engines
           CASE WHEN t.n * (t.n - 1) / 2 - mx.n1 > 0
                 AND t.n * (t.n - 1) / 2 - my.n2 > 0 THEN
           CAST(floor(1000000.0 * CAST(cd.nc - cd.nd AS DOUBLE)
                / (sqrt(CAST(t.n * (t.n - 1) / 2 - mx.n1 AS DOUBLE))
                   * sqrt(CAST(t.n * (t.n - 1) / 2 - my.n2 AS DOUBLE))))
                AS BIGINT) END AS tau_b_q6
    FROM tot t
    JOIN cd ON cd.flag = t.flag
    JOIN mx ON mx.flag = t.flag
    JOIN my ON my.flag = t.flag
    ORDER BY t.flag
    """,
    doc="exact Kendall tau-b (quantity vs binned price) per return flag "
    "from the joint value-lattice histogram: concordant/discordant counts "
    "are c1*c2 folds over ordered cell pairs (x1<x2), x/y tie terms from "
    "the marginals, everything BIGINT until the final tau. The histogram "
    "groupBy is the only data-scale pass; the cell-pair join is lattice "
    "grain. sqrt factors are taken separately so each cast-to-double "
    "stays under 2^53 and bit-identical across engines.",
)
def stats_kendall_tau_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint").alias("y"),
    )
    hist = pts.groupBy("flag", "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = hist.groupBy("flag").agg(F.sum("c").cast("bigint").alias("n"))
    h2 = hist.select(
        F.col("flag").alias("f2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        F.col("c").alias("c2"),
    )
    cd = (
        hist.join(
            F.broadcast(h2),
            (F.col("f2") == F.col("flag")) & (F.col("x2") > F.col("x")),
        )
        .groupBy("flag")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y"), F.col("c") * F.col("c2")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("nc"),
            F.sum(
                F.when(F.col("y2") < F.col("y"), F.col("c") * F.col("c2")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("nd"),
        )
    )
    mx = (
        hist.groupBy("flag", "x")
        .agg(F.sum("c").cast("bigint").alias("cx"))
        .groupBy("flag")
        .agg(F.sum(F.expr("cx * (cx - 1) div 2")).cast("bigint").alias("n1"))
    )
    my = (
        hist.groupBy("flag", "y")
        .agg(F.sum("c").cast("bigint").alias("cy"))
        .groupBy("flag")
        .agg(F.sum(F.expr("cy * (cy - 1) div 2")).cast("bigint").alias("n2"))
    )
    n0 = F.expr("n * (n - 1) div 2")
    # zero-variance guard (all-tied x or y): tau undefined, NULL — the
    # Infinity -> BIGINT cast would abort under ANSI (oracle mirrors)
    tau = F.when(
        (n0 - F.col("n1") > 0) & (n0 - F.col("n2") > 0),
        F.floor(
            1000000.0
            * (F.col("nc") - F.col("nd")).cast("double")
            / (
                F.sqrt((n0 - F.col("n1")).cast("double"))
                * F.sqrt((n0 - F.col("n2")).cast("double"))
            )
        ).cast("bigint"),
    )
    return (
        tot.join(cd, "flag")
        .join(mx, "flag")
        .join(my, "flag")
        .select("flag", "n", "nc", "nd", "n1", "n2", tau.alias("tau_b_q6"))
        .orderBy("flag")
    )


_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    stages = [
        """
    pp AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e0 AS MATERIALIZED (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
    )"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        stages.append(
            f"""
    d{r} AS MATERIALIZED (
        SELECT node, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT u AS node FROM e{r - 1}
              UNION ALL SELECT v FROM e{r - 1})
        GROUP BY node
    ), k{r} AS (SELECT node FROM d{r} WHERE c >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
        SELECT e.u, e.v FROM e{r - 1} e
        JOIN k{r} a ON a.node = e.u
        JOIN k{r} b ON b.node = e.v
    )"""
        )
    last = _KCORE_ROUNDS
    return (
        "WITH "
        + ",".join(stages)
        + f"""
    SELECT node, CAST(count(*) AS BIGINT) AS deg
    FROM (SELECT u AS node FROM e{last} UNION ALL SELECT v FROM e{last})
    GROUP BY node
    ORDER BY deg DESC, node LIMIT 50
    """
    )


@register(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    doc=f"{_KCORE_ROUNDS}-round {_KCORE_K}-core peel of the parts-co-"
    "ordered graph (iterative minimum-degree pruning, Matula & Beck 1983 "
    "— the dense-subgraph primitive under community mining): each round "
    "drops nodes whose CURRENT degree < k and the edges touching them. "
    "Defined as a FIXED round count, not to-convergence, so the Spark "
    "loop and the oracle's unrolled CTE stages compute the identical "
    "subgraph with a bounded plan: per round one endpoint explode + "
    "keyed degree groupBy + two endpoint-keyed joins; lineage stays "
    f"{_KCORE_ROUNDS} rounds deep. Output: top-50 surviving parts by "
    "residual degree (total order: deg desc, node).",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # each peel round reads the previous round's edges TWICE (degree
    # count + endpoint filter); lazy-checkpoint per round or the DAG
    # re-derives the base edge build exponentially (the CC operator's
    # lesson, operators/graphs.py:52) — the oracle mirrors this with
    # AS MATERIALIZED stages.
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey", checkpoint=True)

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )

    for _ in range(_KCORE_ROUNDS):
        # keep is consumed by BOTH endpoint joins — checkpoint the
        # <=|V|-row survivor set or the degree groupBy over the full
        # edge list runs twice per round. r10 A/B: 4.37 -> 4.48 s
        # min-of-2 warm at sf0.1 (in-noise locally — the fixture degree
        # agg is cheap); kept because at 100 TB the removed recompute is
        # one full-edge-list keyed shuffle per round for a |V|-row write
        keep = (
            degrees(edges)
            .filter(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=False)
        )
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.withColumnRenamed("node", "v"), "v")
            .localCheckpoint(eager=False)
        )
    return degrees(edges).orderBy(F.desc("deg"), "node").limit(50)


@register(
    "text_hellinger_drift",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
        FROM documents
    ), sc AS (
        SELECT source, t, CAST(count(*) AS BIGINT) AS cs
        FROM toks WHERE t != '' GROUP BY source, t
    ), ns AS (
        SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM sc GROUP BY source
    ), gc AS (
        SELECT t, CAST(sum(cs) AS BIGINT) AS cg FROM sc GROUP BY t
    ), ng AS (SELECT CAST(sum(cs) AS BIGINT) AS ng FROM sc),
    contrib AS (
        SELECT sc.source,
               CAST(floor(1000000000.0 * sqrt(
                   CAST(sc.cs * gc.cg AS DOUBLE)
                   / CAST(ns.ns * ng.ng AS DOUBLE))) AS BIGINT) AS a9
        FROM sc
        JOIN gc ON gc.t = sc.t
        JOIN ns ON ns.source = sc.source
        CROSS JOIN ng
    )
    SELECT c.source, ns.ns AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c.a9) AS BIGINT) AS affinity_n9,
           CAST((1000000000 - sum(c.a9)) // 1000 AS BIGINT)
               AS hellinger_sq_q6
    FROM contrib c JOIN ns ON ns.source = c.source
    GROUP BY c.source, ns.ns
    ORDER BY c.source
    """,
    doc="per-source unigram drift vs the global corpus as Hellinger "
    "affinity BC = sum_t sqrt(p_t*q_t): per-token sqrt((cs*cg)/(ns*ng)) "
    "uses only IEEE-exact-or-identically-rounded ops (cast, one divide, "
    "sqrt — never ln), floor-quantized to nano-units AT TOKEN GRAIN so "
    "the per-source sum is an order-free BIGINT fold. Global counts "
    "derive from the (source, token) table — one corpus scan total; "
    "joins are token-keyed. H^2 = 1 - BC reported in micro-units. "
    "Precondition: ns*ng < 2^53 for the exact double cast (rescale both "
    "counts by a common power of two past that).",
)
def text_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import normalize_text

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("t"),
    ).filter(F.col("t") != "")
    sc = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cs")
    )
    ns = sc.groupBy("source").agg(F.sum("cs").cast("bigint").alias("ns"))
    gc = sc.groupBy("t").agg(F.sum("cs").cast("bigint").alias("cg"))
    ng = sc.agg(F.sum("cs").cast("bigint").alias("ng"))
    contrib = (
        sc.join(gc, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            "ns",
            F.floor(
                1000000000.0
                * F.sqrt(
                    (F.col("cs") * F.col("cg")).cast("double")
                    / (F.col("ns") * F.col("ng")).cast("double")
                )
            )
            .cast("bigint")
            .alias("a9"),
        )
    )
    return (
        contrib.groupBy("source", "ns")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum("a9").cast("bigint").alias("affinity_n9"),
        )
        .select(
            "source",
            F.col("ns").alias("n_tokens"),
            "vocab",
            "affinity_n9",
            F.expr("(1000000000 - affinity_n9) div 1000")
            .cast("bigint")
            .alias("hellinger_sq_q6"),
        )
        .orderBy("source")
    )


@register(
    "dq_freshness_gaps",
    oracle="""
    WITH cnts AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), spine AS (
        SELECT event_type,
               CAST(unnest(generate_series(min(day), max(day),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM cnts GROUP BY event_type
    ), filled AS (
        SELECT s.event_type, s.day, coalesce(c.cnt, 0) AS cnt
        FROM spine s LEFT JOIN cnts c
          ON c.event_type = s.event_type AND c.day = s.day
    ), med AS (
        SELECT event_type, day, cnt,
               list_sort(list(cnt) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS win
        FROM filled
    )
    SELECT event_type, day, cnt,
           CASE WHEN len(win) > 0
                THEN CAST(win[(len(win) + 1) // 2] AS BIGINT) END
               AS trail_med,
           CAST(CASE WHEN cnt = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_gap,
           CAST(CASE WHEN len(win) > 0
                      AND 2 * cnt < win[(len(win) + 1) // 2]
                     THEN 1 ELSE 0 END AS INTEGER) AS is_stale
    FROM med ORDER BY event_type, day
    """,
    doc="table-freshness / completeness monitor: per (event_type, day) "
    "counts on a GAP-FILLED calendar spine (date sequence + explode, so "
    "missing landing days surface as explicit zero rows), trailing-7-day "
    "lower-median baseline (sorted 7-element frame, exact rank pick), "
    "integer staleness rule 2*cnt < median. The only data-scale pass is "
    "the day-count groupBy; spine, window and flags run at day grain.",
)
def dq_freshness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cnts = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    spine = (
        cnts.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    filled = spine.join(cnts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    win = F.array_sort(F.collect_list("cnt").over(w))
    med = F.when(
        F.size(win) > 0,
        F.element_at(win, ((F.size(win) + 1) / 2).cast("int")),
    ).cast("bigint")
    out = filled.select("event_type", "day", "cnt", med.alias("trail_med"))
    return out.select(
        "event_type",
        "day",
        "cnt",
        "trail_med",
        F.when(F.col("cnt") == 0, 1).otherwise(0).cast("int").alias("is_gap"),
        F.when(
            F.col("trail_med").isNotNull()
            & (2 * F.col("cnt") < F.col("trail_med")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("is_stale"),
    ).orderBy("event_type", "day")


@register(
    "misc_bitpack_for_blocks",
    oracle="""
    WITH v AS (
        SELECT l_suppkey AS supp,
               CAST(CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)
                    - DATE '1970-01-01' AS BIGINT) AS val,
               row_number() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ), blk AS (
        SELECT supp, (rn - 1) // 64 AS block,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(val) - min(val) AS BIGINT) AS rng
        FROM v GROUP BY supp, (rn - 1) // 64
    ), sized AS (
        SELECT supp, n,
               CASE WHEN rng = 0 THEN 0
                    ELSE CAST(length(bin(rng)) AS BIGINT) END AS width
        FROM blk
    )
    SELECT supp AS l_suppkey,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(64 + n * width) AS BIGINT) AS packed_bits,
           CAST(sum(64 * n) AS BIGINT) AS raw_bits,
           CAST(sum(64 + n * width) * 1000000 // sum(64 * n) AS BIGINT)
               AS ratio_q6
    FROM sized GROUP BY supp
    ORDER BY ratio_q6, l_suppkey LIMIT 50
    """,
    doc="frame-of-reference + bit-packing size estimator (the parquet/ORC "
    "encoding decision as a query, beside misc_rle_encode and "
    "misc_delta_zigzag_encode): 64-row blocks within each supplier's "
    "shipdate-ordered lineitems, per-block reference = min shipdate-day, "
    "payload width = bit length of (max-min) via length(bin(range)) — "
    "identical semantics both engines — packed = 64 + n*width bits. "
    "Blocks live inside the supplier partition (keyed window, keyed "
    "groupBy), so no block ever crosses a partition at scale. Output: "
    "top-50 best-compressing suppliers (ratio asc, suppkey).",
)
def misc_bitpack_for_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    v = li.select(
        F.col("l_suppkey").alias("supp"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("val"),
        F.row_number().over(w).alias("rn"),
    )
    blk = v.groupBy("supp", F.expr("(rn - 1) div 64").alias("block")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.max("val") - F.min("val")).cast("bigint").alias("rng"),
    )
    sized = blk.select(
        "supp",
        "n",
        F.when(F.col("rng") == 0, F.lit(0))
        .otherwise(F.length(F.bin("rng")))
        .cast("bigint")
        .alias("width"),
    )
    return (
        sized.groupBy(F.col("supp").alias("l_suppkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum(64 + F.col("n") * F.col("width"))
            .cast("bigint")
            .alias("packed_bits"),
            F.sum(64 * F.col("n")).cast("bigint").alias("raw_bits"),
        )
        .withColumn(
            "ratio_q6",
            F.expr("packed_bits * 1000000 div raw_bits").cast("bigint"),
        )
        .orderBy("ratio_q6", "l_suppkey")
        .limit(50)
    )


@register(
    "stats_cohens_kappa",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS actual,
           CASE WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
                WHEN s_es >= greatest(s_de, s_fr, s_zh)       THEN 'es'
                WHEN s_de >= greatest(s_fr, s_zh)             THEN 'de'
                WHEN s_fr >= s_zh                             THEN 'fr'
                ELSE 'zh' END AS predicted
        FROM (
            SELECT lang, {_lang_scores_sql()} FROM documents
        )
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END)
                    AS BIGINT) AS agree
        FROM scored
    ), ra AS (
        SELECT actual AS cls, CAST(count(*) AS BIGINT) AS rk
        FROM scored GROUP BY actual
    ), ca AS (
        SELECT predicted AS cls, CAST(count(*) AS BIGINT) AS ck
        FROM scored GROUP BY predicted
    ), pe AS (
        SELECT CAST(sum(coalesce(ra.rk, 0) * coalesce(ca.ck, 0)) AS BIGINT)
                   AS pe_num
        FROM ra FULL OUTER JOIN ca ON ca.cls = ra.cls
    )
    SELECT t.n, t.agree, p.pe_num,
           CAST(1000000 * t.agree // t.n AS BIGINT) AS po_q6,
           CAST(1000000 * p.pe_num // (t.n * t.n) AS BIGINT) AS pe_q6,
           CAST(1000000 * (t.n * t.agree - p.pe_num)
                // (t.n * t.n - p.pe_num) AS BIGINT) AS kappa_q6
    FROM tot t CROSS JOIN pe p
    """,
    doc="Cohen's kappa (1960) between the heuristic language-ID predictor "
    "and the labeled lang column — chance-corrected agreement, the "
    "companion to text_lang_confusion_eval's P/R/F1: kappa = (N*agree - "
    "sum_k row_k*col_k) / (N^2 - sum_k row_k*col_k), an exact BIGINT "
    "rational quantized with truncating division (Spark div == DuckDB "
    "//). One corpus scan; marginals join at class grain (K<=5 rows).",
)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.queries.text import lang_pred, lang_scores

    d = load(spark, sf_dir, "documents")
    pred_col = lang_pred(lang_scores(F.col("text")))
    scored = d.select(F.col("lang").alias("actual"), pred_col.alias("predicted"))
    tot = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("actual") == F.col("predicted"), 1).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    ra = scored.groupBy(F.col("actual").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("rk")
    )
    ca = scored.groupBy(F.col("predicted").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ck")
    )
    pe = (
        ra.join(ca, "cls", "full_outer")
        .select(
            (F.coalesce("rk", F.lit(0)) * F.coalesce("ck", F.lit(0))).alias("p")
        )
        .agg(F.sum("p").cast("bigint").alias("pe_num"))
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        "n",
        "agree",
        "pe_num",
        F.expr("1000000 * agree div n").cast("bigint").alias("po_q6"),
        F.expr("1000000 * pe_num div (n * n)").cast("bigint").alias("pe_q6"),
        F.expr("1000000 * (n * agree - pe_num) div (n * n - pe_num)")
        .cast("bigint")
        .alias("kappa_q6"),
    )


@register(
    "events_concurrency_peak",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ), pts AS (
        SELECT event_type, day, us AS t, CAST(1 AS BIGINT) AS delta FROM e
        UNION ALL
        SELECT event_type, day, us + 300000000 AS t, CAST(-1 AS BIGINT)
        FROM e
    ), swept AS (
        SELECT event_type, day,
               sum(delta) OVER (PARTITION BY event_type, day
                                ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS open
        FROM pts
    )
    SELECT s.event_type, s.day,
           CAST(max(s.open) AS BIGINT) AS peak_concurrency,
           CAST(count(*) / 2 AS BIGINT) AS n_events
    FROM swept s GROUP BY s.event_type, s.day
    ORDER BY s.event_type, s.day
    """,
    doc="sweep-line maximum concurrency (capacity planning's 'max "
    "concurrent calls'): each event opens a 5-minute half-open activity "
    "window [t, t+300s); +1/-1 points, running sum ordered by (t, delta) "
    "— delta -1 sorts first so windows touching end-to-start never "
    "overlap — partition-local max. Keyed by (event_type, start day), so "
    "the sweep never leaves a partition; ties among equal (t, delta) "
    "points permute intermediate values but not the multiset, so the max "
    "is order-stable. Cross-day interactions are out of scope by the "
    "partition definition (windows belong to their start day).",
)
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("us"),
    )
    pts = e.select(
        "event_type", "day", F.col("us").alias("t"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        e.select(
            "event_type",
            "day",
            (F.col("us") + 300_000_000).alias("t"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = pts.withColumn("open", F.sum("delta").over(w))
    return (
        swept.groupBy("event_type", "day")
        .agg(
            F.max("open").cast("bigint").alias("peak_concurrency"),
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS s_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
        SELECT e.user_id,
               min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS p_us,
               min(s.s_us) AS s_us
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= s.s_us
        GROUP BY e.user_id
    ), d AS (
        SELECT (p_us - s_us) // 60000000 AS dm, p_us - s_us AS dus FROM p
    ), hist AS (
        SELECT dm, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY dm
    ), tot AS (
        -- coalesce/nullif: zero converters is a COUNT of 0, not NULL,
        -- and the mean over zero is NULL, not a div-by-zero (r11 fuzz,
        -- hostile empty-events tree)
        SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
               (SELECT CAST(sum(dus) AS BIGINT) FROM d) AS sum_us
        FROM hist
    ), cum AS (
        SELECT dm, sum(c) OVER (ORDER BY dm ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    )
    SELECT t.n AS n_converted,
           (SELECT CAST(min(dm) AS BIGINT) FROM cum
             WHERE 2 * cum >= t.n) AS med_min,
           (SELECT CAST(min(dm) AS BIGINT) FROM cum
             WHERE 10 * cum >= 9 * t.n) AS p90_min,
           CAST(t.sum_us // nullif(t.n, 0) AS BIGINT) AS mean_us
    FROM tot t
    """,
    doc="funnel latency distribution (first signup -> first subsequent "
    "purchase per user): deltas quantized to a MINUTE lattice so the "
    "median / p90 come from the exact integer 2*cum >= k*n rank rule "
    "over a bounded histogram (lattice grain, never a global sort of "
    "users), mean in exact microseconds with truncating division. The "
    "conversion join is user-keyed; the only data-scale passes are the "
    "two type-filtered min-aggregations.",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("s_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"), F.min("s_us").alias("s_us"))
    )
    d = p.select(
        F.expr("(p_us - s_us) div 60000000").alias("dm"),
        (F.col("p_us") - F.col("s_us")).alias("dus"),
    )
    hist = d.groupBy("dm").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dus").cast("bigint").alias("sum_us"),
    )
    wc = Window.orderBy("dm").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("cum", F.sum("c").over(wc))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("dm").cast("bigint").alias("med_min"))
    )
    p90 = (
        cum.crossJoin(F.broadcast(tot))
        .filter(10 * F.col("cum") >= 9 * F.col("n"))
        .agg(F.min("dm").cast("bigint").alias("p90_min"))
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(p90))
        .select(
            F.col("n").alias("n_converted"),
            "med_min",
            "p90_min",
            F.expr("sum_us div nullif(n, 0)").cast("bigint").alias("mean_us"),
        )
    )


@register(
    "ml_linreg_normal_eq",
    oracle="""
    WITH r AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(round(l_discount * 100) AS BIGINT) AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ), m AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x1 * x1) AS BIGINT) AS s11,
               CAST(sum(x1 * x2) AS BIGINT) AS s12,
               CAST(sum(x2 * x2) AS BIGINT) AS s22,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x1 * y) AS BIGINT) AS s1y,
               CAST(sum(x2 * y) AS BIGINT) AS s2y
        FROM r GROUP BY flag
    ), dets AS (
        SELECT flag, n,
           CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)
                                - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
         - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)
                                - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
         + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)
                                - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))
               AS det,
           CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)
                                - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
         - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)
                                - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
         + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)
                                - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE))
               AS det0,
           CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)
                                - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
         - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)
                                - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
         + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)
                                - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
               AS det1,
           CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)
                                - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))
         - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)
                                - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
         + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)
                                - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))
               AS det2
        FROM m
    )
    SELECT flag, n,
           CASE WHEN det != 0
                THEN CAST(floor(1000000.0 * det0 / det) AS BIGINT) END
               AS b0_q6,
           CASE WHEN det != 0
                THEN CAST(floor(1000000.0 * det1 / det) AS BIGINT) END
               AS b1_q6,
           CASE WHEN det != 0
                THEN CAST(floor(1000000.0 * det2 / det) AS BIGINT) END
               AS b2_q6
    FROM dets ORDER BY flag
    """,
    doc="multi-feature OLS via the NORMAL EQUATIONS (price-cents ~ "
    "quantity + discount-cents + intercept, per return flag) — the "
    "distributed linear-regression recipe: ONE map-side-combinable "
    "groupBy produces the 9 exact BIGINT moment sums (the Gram matrix "
    "never leaves integer arithmetic), then the 3x3 solve is Cramer's "
    "rule on K rows. Determinants are evaluated in DOUBLE with an "
    "explicitly parenthesised term order identical on both engines "
    "(casts of exact BIGINTs, then the same multiply/subtract tree), so "
    "the quantized coefficients are bit-reproducible. Degenerate groups "
    "(det = 0) yield NULL coefficients instead of ANSI division errors "
    "(the agg_group_ols guard discipline). Scale: data pass is one "
    "groupBy; everything after is per-group constant work.",
)
def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    m = r.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
    )

    def _d(c: str):
        return F.col(c).cast("double")

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        return (
            _d(a1) * (_d(b2) * _d(c3) - _d(b3) * _d(c2))
            - _d(a2) * (_d(b1) * _d(c3) - _d(b3) * _d(c1))
            + _d(a3) * (_d(b1) * _d(c2) - _d(b2) * _d(c1))
        )

    # A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]; columns replaced by
    # [sy,s1y,s2y] for det0/det1/det2.  Term order mirrors the oracle
    # LITERALLY (row-1 expansion) so double rounding is identical.
    dets = m.select(
        "flag",
        "n",
        (
            _d("n") * (_d("s11") * _d("s22") - _d("s12") * _d("s12"))
            - _d("s1") * (_d("s1") * _d("s22") - _d("s12") * _d("s2"))
            + _d("s2") * (_d("s1") * _d("s12") - _d("s11") * _d("s2"))
        ).alias("det"),
        (
            _d("sy") * (_d("s11") * _d("s22") - _d("s12") * _d("s12"))
            - _d("s1") * (_d("s1y") * _d("s22") - _d("s12") * _d("s2y"))
            + _d("s2") * (_d("s1y") * _d("s12") - _d("s11") * _d("s2y"))
        ).alias("det0"),
        (
            _d("n") * (_d("s1y") * _d("s22") - _d("s12") * _d("s2y"))
            - _d("sy") * (_d("s1") * _d("s22") - _d("s12") * _d("s2"))
            + _d("s2") * (_d("s1") * _d("s2y") - _d("s1y") * _d("s2"))
        ).alias("det1"),
        (
            _d("n") * (_d("s11") * _d("s2y") - _d("s1y") * _d("s12"))
            - _d("s1") * (_d("s1") * _d("s2y") - _d("s1y") * _d("s2"))
            + _d("sy") * (_d("s1") * _d("s12") - _d("s11") * _d("s2"))
        ).alias("det2"),
    )
    q = lambda c: F.when(
        F.col("det") != 0,
        F.floor(1000000.0 * F.col(c) / F.col("det")).cast("bigint"),
    )
    return dets.select(
        "flag",
        "n",
        q("det0").alias("b0_q6"),
        q("det1").alias("b1_q6"),
        q("det2").alias("b2_q6"),
    ).orderBy("flag")


def _markov_cte() -> str:
    """Shared CTE prefix: transition counts, row sums, and the 5 exact
    fixed-point power-iteration rounds (used by events_markov_stationary
    and events_markov_entropy_rate)."""
    rounds = []
    for r in range(1, 6):
        rounds.append(
            f"""
    v{r} AS MATERIALIZED (
        SELECT c.j AS state, CAST(sum((v{r - 1}.v * c.c) // r.r) AS BIGINT) AS v
        FROM v{r - 1}
        JOIN c ON c.i = v{r - 1}.state
        JOIN r ON r.i = c.i
        GROUP BY c.j
    )"""
        )
    return (
        """
    t AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS nxt
        FROM events
    ), c AS (
        SELECT event_type AS i, nxt AS j, CAST(count(*) AS BIGINT) AS c
        FROM t WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), r AS (
        SELECT i, CAST(sum(c) AS BIGINT) AS r FROM c GROUP BY i
    ), k AS (SELECT CAST(count(*) AS BIGINT) AS kk FROM r),
    v0 AS (SELECT i AS state, CAST(1000000 // kk AS BIGINT) AS v FROM r, k),"""
        + ",".join(rounds)
    )


def _markov_oracle() -> str:
    return (
        "WITH "
        + _markov_cte()
        + """
    SELECT r.i AS state, r.r AS n_out,
           CAST(coalesce(v5.v, 0) AS BIGINT) AS stationary_q6
    FROM r LEFT JOIN v5 ON v5.state = r.i
    ORDER BY state
    """
    )


def _markov_chain(spark: SparkSession, sf_dir: str):
    """(c, r, v): per-user next-event transition counts (i, j, c), row
    totals (i, r), and the 5-round all-integer fixed-point stationary
    vector (state, v in micro-units) — the Spark mirror of the shared
    ``_markov_cte()`` oracle fragment. ONE definition for
    events_markov_stationary and events_markov_entropy_rate (the
    round-8 review found the whole block duplicated, where an
    iteration/tiebreak fix in one would silently desynchronize the
    other from their SHARED oracle CTE)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = ev.withColumn("nxt", F.lead("event_type").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    c = t.groupBy(
        F.col("event_type").alias("i"), F.col("nxt").alias("j")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    r = c.groupBy("i").agg(F.sum("c").cast("bigint").alias("r"))
    k = r.agg(F.count(F.lit(1)).cast("bigint").alias("kk"))
    v = r.crossJoin(F.broadcast(k)).select(
        F.col("i").alias("state"), F.expr("1000000 div kk").cast("bigint").alias("v")
    )
    # checkpoint (round 9): cr (K^2 rows) is referenced by EVERY round
    # and each v by the next — unmaterialized, the events window + count
    # chain re-nests once per round into the final plan (the
    # emb_pca_power_iter finding; these tables are <= K^2 = tens of rows)
    cr = c.join(r, "i").localCheckpoint(eager=False)
    for _ in range(5):
        v = (
            v.join(cr, v.state == cr.i)
            .select("j", F.expr("(v * c) div r").alias("term"))
            .groupBy(F.col("j").alias("state"))
            .agg(F.sum("term").cast("bigint").alias("v"))
            .localCheckpoint(eager=False)
        )
    return c, r, v


@register(
    "events_markov_stationary",
    oracle=_markov_oracle(),
    doc="stationary distribution of the per-user event-type Markov chain "
    "by FIVE exact fixed-point power-iteration rounds (the companion to "
    "events_markov_transitions; same recipe as graph_pagerank but on a "
    "row-normalised transition matrix): v_{t+1,j} = sum_i (v_i * c_ij) "
    "div r_i entirely in micro-unit BIGINTs — per-term truncating "
    "division then an order-free integer sum, so both engines agree "
    "bit-for-bit without any float. The only data-scale pass builds the "
    "(i, j) transition counts (one lead window + one keyed groupBy); "
    "every iteration runs at K^2 grain (K = #event types). States = "
    "those with outgoing transitions; truncation dust makes sum(v) "
    "drift a few micro-units below 1e6 by design.",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, r, v = _markov_chain(spark, sf_dir)
    return (
        r.join(v, r.i == v.state, "left")
        .select(
            F.col("i").alias("state"),
            F.col("r").alias("n_out"),
            F.coalesce("v", F.lit(0)).cast("bigint").alias("stationary_q6"),
        )
        .orderBy("state")
    )


_HILBERT_N = 256  # 8-bit Hilbert grid


def _hilbert_oracle() -> str:
    """Canonical xy2d (Wikipedia 'Hilbert curve', public domain algorithm)
    unrolled over 8 MATERIALIZED stages at distinct-pair grain."""
    stages = [
        """
    pts AS (
        SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y, count(*) AS n
        FROM lineitem GROUP BY 1, 2
    ), h8 AS (SELECT x, y, n, x AS xt, y AS yt, CAST(0 AS BIGINT) AS d
              FROM pts)"""
    ]
    s = _HILBERT_N // 2
    i = 8
    while s > 0:
        stages.append(
            f"""
    h{i - 1} AS MATERIALIZED (
        SELECT x, y, n,
            CASE WHEN (yt // {s}) % 2 = 1 THEN xt
                 WHEN (xt // {s}) % 2 = 1 THEN {_HILBERT_N - 1} - yt
                 ELSE yt END AS xt,
            CASE WHEN (yt // {s}) % 2 = 1 THEN yt
                 WHEN (xt // {s}) % 2 = 1 THEN {_HILBERT_N - 1} - xt
                 ELSE xt END AS yt,
            d + {s * s} * (CASE WHEN (xt // {s}) % 2 = 0
                                 AND (yt // {s}) % 2 = 0 THEN 0
                                WHEN (xt // {s}) % 2 = 0 THEN 1
                                WHEN (yt // {s}) % 2 = 1 THEN 2
                                ELSE 3 END) AS d
        FROM h{i}
    )"""
        )
        s //= 2
        i -= 1
    return (
        "WITH "
        + ",".join(stages)
        + """
    SELECT d // 1024 AS bucket, CAST(sum(n) AS BIGINT) AS n,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM h0 GROUP BY 1 ORDER BY bucket
    """
    )


@register(
    "misc_hilbert_layout",
    oracle=_hilbert_oracle(),
    doc="Hilbert-curve data layout (the locality-better sibling of "
    "misc_zorder_layout — Delta/Iceberg OPTIMIZE's other curve; "
    "canonical xy2d, Wikipedia/Hamilton): 8-bit (partkey, suppkey) "
    "cells walk 8 rounds of the quadrant-rotate recurrence in pure "
    "integer CASE arithmetic, identical on both engines. The curve is "
    "computed ONCE at distinct-cell grain (<= 4^bits rows, "
    "localCheckpoint every few rounds to keep the projection tree "
    "linear) and broadcast-joined back to the fact rows — at 100 TB "
    "the Hilbert dictionary is a bounded build-once table, never a "
    "per-row 8-deep expression. Output: per 1024-key bucket row count "
    "+ bounding box (Hilbert buckets have tighter boxes than Morton's "
    "worst-case jumps — the reason to prefer them for range pruning).",
)
def misc_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"), (F.col("l_suppkey") % 256).alias("y")
    )
    pts = li.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cur = pts.select("x", "y", "n", F.col("x").alias("xt"), F.col("y").alias("yt"),
                     F.lit(0).cast("bigint").alias("d"))
    s = _HILBERT_N // 2
    rnd = 0
    while s > 0:
        rx = (F.col("xt") / s).cast("long") % 2
        ry = (F.col("yt") / s).cast("long") % 2
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 1, 2)
            .otherwise(3)
        )
        cur = cur.select(
            "x",
            "y",
            "n",
            F.when(ry == 1, F.col("xt"))
            .when(rx == 1, F.lit(_HILBERT_N - 1) - F.col("yt"))
            .otherwise(F.col("yt"))
            .alias("xt"),
            F.when(ry == 1, F.col("yt"))
            .when(rx == 1, F.lit(_HILBERT_N - 1) - F.col("xt"))
            .otherwise(F.col("xt"))
            .alias("yt"),
            (F.col("d") + s * s * quad).alias("d"),
        )
        rnd += 1
        if rnd % 3 == 0:  # keep the collapsed projection tree linear
            cur = cur.localCheckpoint(eager=False)
        s //= 2
    return (
        cur.groupBy(F.expr("d div 1024").alias("bucket"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
        .orderBy("bucket")
    )


@register(
    "text_pmi_collocations",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t,
               generate_subscripts(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1)
                   AS pos
        FROM documents
    ), big AS (
        SELECT a.t AS x, b.t AS y
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ), cxy AS (
        SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy
        FROM big WHERE x != '' AND y != '' GROUP BY x, y
    ), uni AS (
        SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks
        WHERE t != '' GROUP BY t
    ), tot AS (
        SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS nu,
               (SELECT CAST(sum(c_xy) AS BIGINT) FROM cxy) AS nb
    )
    SELECT p.x, p.y, p.c_xy,
           CAST(floor(1000000.0 *
                (CAST(p.c_xy AS DOUBLE) / CAST(t.nb AS DOUBLE))
                / ((CAST(ux.c AS DOUBLE) / CAST(t.nu AS DOUBLE))
                   * (CAST(uy.c AS DOUBLE) / CAST(t.nu AS DOUBLE))))
               AS BIGINT) AS lift_q6
    FROM cxy p
    JOIN uni ux ON ux.t = p.x
    JOIN uni uy ON uy.t = p.y
    CROSS JOIN tot t
    WHERE p.c_xy >= 5
    ORDER BY lift_q6 DESC, p.x, p.y LIMIT 30
    """,
    doc="PMI collocation mining (pointwise mutual information; ranked by "
    "the monotone-equivalent LIFT = P(xy)/(P(x)P(y)) so no logarithm "
    "ever runs — lift is three exact-int-to-double casts, four divides "
    "and a multiply in an identical order on both engines, then "
    "floor-quantized): adjacent-token bigram counts vs unigram "
    "marginals, min support 5. Data passes: one tokenize + lead for "
    "bigrams, two keyed groupBys; the lift join is token-keyed. Top-30 "
    "by (lift desc, pair) total order.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import normalize_text

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias("pos", "t"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = toks.withColumn("y", F.lead("t").over(w)).filter(
        F.col("y").isNotNull() & (F.col("t") != "") & (F.col("y") != "")
    )
    cxy = big.groupBy(F.col("t").alias("x"), "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_xy")
    )
    uni = (
        toks.filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("nu")).crossJoin(
        cxy.agg(F.sum("c_xy").cast("bigint").alias("nb"))
    )
    ux = uni.select(F.col("t").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("t").alias("y"), F.col("c").alias("cy"))
    lift = F.floor(
        1000000.0
        * (F.col("c_xy").cast("double") / F.col("nb").cast("double"))
        / (
            (F.col("cx").cast("double") / F.col("nu").cast("double"))
            * (F.col("cy").cast("double") / F.col("nu").cast("double"))
        )
    ).cast("bigint")
    return (
        cxy.filter(F.col("c_xy") >= 5)
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .select("x", "y", "c_xy", lift.alias("lift_q6"))
        .orderBy(F.desc("lift_q6"), "x", "y")
        .limit(30)
    )


_SOUNDEX_MAP = "01230120022455012623010202"  # A..Z census digit map


def _soundex_sql(expr: str) -> str:
    """DuckDB mirror of Spark's builtin ``F.soundex`` (census algorithm;
    pinned equal on the classic trap words in pytest): keep the first
    letter, drop H/W from the tail, digit-map, collapse adjacent
    duplicate digits (RE2 has no backrefs -> 7 chained per-digit
    regexes), drop vowel zeros, pad to 3."""
    u = f"upper({expr})"
    coded = (
        f"translate(substring({u}, 1, 1) || "
        f"replace(replace(substring({u}, 2), 'H', ''), 'W', ''), "
        f"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_MAP}')"
    )
    collapsed = coded
    for d in range(7):
        collapsed = f"regexp_replace({collapsed}, '{d}{d}+', '{d}', 'g')"
    return (
        f"substring({u}, 1, 1) || substring("
        f"replace(substring({collapsed}, 2), '0', '') || '000', 1, 3)"
    )


@register(
    "str_phonetic_soundex",
    oracle=f"""
    WITH w AS (
        SELECT DISTINCT unnest(string_split(p_name, ' ')) AS word FROM part
    ), sx AS (
        SELECT word, {_soundex_sql('word')} AS code
        FROM w WHERE word != ''
    )
    SELECT code, CAST(count(*) AS BIGINT) AS n_words,
           string_agg(word, '|' ORDER BY word) AS words
    FROM sx GROUP BY code ORDER BY code
    """,
    doc="American (census) Soundex phonetic encoding of part-name words "
    "— the fuzzy-matching classic beside str_levenshtein and "
    "fuzzy_token_pairs. Spark side is the JVM builtin F.soundex; the "
    "oracle hand-rolls the census algorithm (_soundex_sql, shared with "
    "er_blocked_linkage), pinned equal to Spark's output on the "
    "classic trap words (ashcraft, pfister, tymczak, honeyman, "
    "hannah) in pytest. Output: collision groups per code with the "
    "sorted member list.",
)
def str_phonetic_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    words = (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    sx = words.select("word", F.soundex("word").alias("code"))
    return (
        sx.groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.array_join(F.array_sort(F.collect_set("word")), "|").alias("words"),
        )
        .orderBy("code")
    )


@register(
    "events_survival_km",
    oracle="""
    WITH gmax AS (
        SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS mx FROM events
    ), u AS (
        SELECT user_id,
               min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS fd,
               max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS ld
        FROM events GROUP BY user_id
    ), durs AS (
        SELECT CAST(ld - fd AS BIGINT) AS t,
               CASE WHEN ld <= mx - 3 THEN 1 ELSE 0 END AS churned
        FROM u CROSS JOIN gmax
    ), rt AS (
        SELECT t, CAST(count(*) AS BIGINT) AS c_all,
               CAST(sum(churned) AS BIGINT) AS d
        FROM durs GROUP BY t
    ), risk AS (
        SELECT t, d,
               sum(c_all) OVER (ORDER BY t DESC
                                ROWS UNBOUNDED PRECEDING) AS n_risk
        FROM rt
    ), enc AS (
        SELECT t, d, n_risk,
               list(n_risk * 1000000000 + (n_risk - d)) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS pre
        FROM risk
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS d_churn,
           CAST(list_reduce(
               list_prepend(CAST(1000000 AS BIGINT), pre),
               (acc, x) -> (acc * (x % 1000000000)) // (x // 1000000000))
               AS BIGINT) AS surv_q6
    FROM enc ORDER BY t
    """,
    doc="Kaplan-Meier survival curve (Kaplan & Meier 1958) for user "
    "lifetime (first->last event days; users still active in the final "
    "3 days are right-CENSORED — they leave the risk set without a "
    "death): S(t) = prod_{u<=t} (n_risk(u) - d(u)) / n_risk(u), "
    "maintained as a TRUNCATING micro-unit integer product fold over "
    "the day lattice — each step (acc * (nr-d)) div nr in BIGINT, so "
    "the sequential product is bit-identical across engines with zero "
    "float (censor-only days multiply by nr/nr and are exact no-ops, "
    "which is why the fold needs no filtering). Data passes: one "
    "user-grain min/max groupBy; risk sets are a suffix cumsum on the "
    "duration lattice (bounded by observation days); the per-day "
    "prefix fold is O(T^2) at lattice grain.",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    gmax = ev.agg(F.max("day").alias("mx"))
    u = ev.groupBy("user_id").agg(
        F.min("day").alias("fd"), F.max("day").alias("ld")
    )
    durs = u.crossJoin(F.broadcast(gmax)).select(
        F.datediff("ld", "fd").cast("bigint").alias("t"),
        F.when(F.col("ld") <= F.date_sub("mx", 3), 1).otherwise(0).alias("churned"),
    )
    rt = durs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = rt.withColumn("n_risk", F.sum("c_all").over(wdesc))
    wasc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    enc = risk.withColumn(
        "pre",
        F.collect_list(
            F.col("n_risk") * 1000000000 + (F.col("n_risk") - F.col("d"))
        ).over(wasc),
    )
    surv = F.expr(
        "aggregate(pre, CAST(1000000 AS BIGINT), "
        "(acc, x) -> (acc * (x % 1000000000)) div (x div 1000000000))"
    )
    return enc.select(
        "t",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("d_churn"),
        surv.cast("bigint").alias("surv_q6"),
    ).orderBy("t")


@register(
    "stats_theil_u",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY lang, source
    ), folds AS (
        SELECT
            (SELECT -list_sum(list_transform(cl, x ->
                (CAST(x AS DOUBLE) / nn) * log2(CAST(x AS DOUBLE) / nn)))
             FROM (SELECT list_sort(list(c)) AS cl, CAST(sum(c) AS DOUBLE)
                       AS nn FROM cells)) AS h_joint,
            (SELECT -list_sum(list_transform(cl, x ->
                (CAST(x AS DOUBLE) / nn) * log2(CAST(x AS DOUBLE) / nn)))
             FROM (SELECT list_sort(list(m)) AS cl, CAST(sum(m) AS DOUBLE)
                       AS nn
                   FROM (SELECT CAST(sum(c) AS BIGINT) AS m
                         FROM cells GROUP BY lang))) AS h_lang,
            (SELECT -list_sum(list_transform(cl, x ->
                (CAST(x AS DOUBLE) / nn) * log2(CAST(x AS DOUBLE) / nn)))
             FROM (SELECT list_sort(list(m)) AS cl, CAST(sum(m) AS DOUBLE)
                       AS nn
                   FROM (SELECT CAST(sum(c) AS BIGINT) AS m
                         FROM cells GROUP BY source))) AS h_source,
            (SELECT CAST(sum(c) AS BIGINT) FROM cells) AS n
    )
    SELECT n,
           round(h_lang, 6)   AS h_lang_q6,
           round(h_source, 6) AS h_source_q6,
           round(h_joint, 6)  AS h_joint_q6,
           round(h_lang + h_source - h_joint, 6) AS mi_q6,
           -- nullif: U is undefined when the conditioning entropy is 0
           -- (single-category marginal, or an empty corpus) — NULL, not
           -- an inf/ANSI abort (r11 fuzz, hostile empty-documents tree)
           round((h_lang + h_source - h_joint) / nullif(h_lang, 0.0), 6)
               AS u_lang_given_source_q6,
           round((h_lang + h_source - h_joint) / nullif(h_source, 0.0), 6)
               AS u_source_given_lang_q6
    FROM folds
    """,
    doc="Theil's uncertainty coefficient U (the entropy-based, "
    "asymmetric association measure beside stats_cramers_v; Theil "
    "1970): U(X|Y) = I(X;Y)/H(X) with I = H(X) + H(Y) - H(X,Y). The "
    "three entropies are SORTED float folds over bounded count lists "
    "(cells <= |langs|*|sources|) — the agg_entropy_gini discipline: "
    "both engines sum the identical series in the identical order, so "
    "log2 rounding cannot reorder into the sixth decimal. One "
    "data-scale pass (the cell groupBy); marginals derive from the "
    "cell table.",
)
def stats_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )

    def h_fold(df: DataFrame, col: str) -> DataFrame:
        g = df.agg(
            F.array_sort(F.collect_list(col)).alias("cs"),
            F.sum(col).cast("bigint").alias("n"),
        )
        n = F.col("n").cast("double")
        ent = -F.aggregate(
            F.col("cs"),
            F.lit(0.0),
            lambda acc, c: acc
            + (c.cast("double") / n) * F.log2(c.cast("double") / n),
        )
        # n NULL iff the distribution is EMPTY: entropy is undefined
        # there (oracle folds over a NULL list), and the -0.0 the empty
        # array fold would yield feeds an ANSI 0/0 abort downstream
        return g.select(F.when(F.col("n").isNotNull(), ent).alias("h"), "n")

    hj = h_fold(cells, "c").select(F.col("h").alias("h_joint"), "n")
    hl = h_fold(
        cells.groupBy("lang").agg(F.sum("c").cast("bigint").alias("cl")), "cl"
    ).select(F.col("h").alias("h_lang"))
    hs = h_fold(
        cells.groupBy("source").agg(F.sum("c").cast("bigint").alias("cs2")),
        "cs2",
    ).select(F.col("h").alias("h_source"))
    mi = F.col("h_lang") + F.col("h_source") - F.col("h_joint")
    return (
        hj.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            "n",
            F.round("h_lang", 6).alias("h_lang_q6"),
            F.round("h_source", 6).alias("h_source_q6"),
            F.round("h_joint", 6).alias("h_joint_q6"),
            F.round(mi, 6).alias("mi_q6"),
            F.round(mi / F.nullif(F.col("h_lang"), F.lit(0.0)), 6).alias(
                "u_lang_given_source_q6"
            ),
            F.round(mi / F.nullif(F.col("h_source"), F.lit(0.0)), 6).alias(
                "u_source_given_lang_q6"
            ),
        )
    )


@register(
    "misc_consistent_hash_ring",
    oracle="""
    WITH ring AS (
        SELECT s_suppkey AS supp,
               CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':' ||
                    CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM supplier, unnest([0, 1, 2]) AS t(v)
    ), arr AS (
        SELECT list_sort(list({'h': h, 'supp': supp})) AS ring_arr FROM ring
    ), keys AS (
        SELECT p_partkey AS part,
               CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS kh
        FROM part
    ), owned AS (
        SELECT part,
               coalesce(list_filter(ring_arr, s -> s.h >= kh)[1],
                        ring_arr[1]).supp AS owner
        FROM keys CROSS JOIN arr
    ), counts AS (
        SELECT owner, CAST(count(*) AS BIGINT) AS n_keys FROM owned
        GROUP BY owner
    )
    SELECT s.s_suppkey, coalesce(c.n_keys, 0) AS n_keys,
           -- nullif: an EMPTY key table (fuzz seed 67) must degrade the
           -- 0-of-0 load share to NULL on both engines, not abort
           -- (Spark's ANSI `div` throws DIVIDE_BY_ZERO)
           CAST(coalesce(c.n_keys, 0) * 1000000
                // nullif((SELECT count(*) FROM part), 0) AS BIGINT)
               AS share_q6
    FROM supplier s LEFT JOIN counts c ON c.owner = s.s_suppkey
    ORDER BY s.s_suppkey
    """,
    doc="consistent-hash ring shard assignment (Karger 1997; the "
    "sharding utility under every distributed KV / shuffle-less "
    "router): suppliers are nodes with 3 virtual points each "
    "(hash60(supp:v)), parts are keys, owner = clockwise successor on "
    "the 60-bit ring (first vnode hash >= key hash, wraparound to the "
    "ring minimum). The ring is BOUNDED (nodes x vnodes), aggregated "
    "to ONE sorted array row and broadcast to the key scan — per-key "
    "work is a filter over the ring array, no shuffle on the data-"
    "scale side, no driver collect (a production impl at larger rings "
    "would bin-partition the ring; documented). Output: per-node key "
    "count + micro-unit load share — the virtual-node balance check.",
)
def misc_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.hashing import hash60

    sup = load(spark, sf_dir, "supplier")
    ring = sup.select(
        F.col("s_suppkey").alias("supp"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
    ).select(
        "supp",
        hash60(
            F.concat_ws(":", F.col("supp").cast("string"), F.col("v").cast("string"))
        ).alias("h"),
    )
    arr = ring.agg(
        F.array_sort(F.collect_list(F.struct("h", "supp"))).alias("ring_arr")
    )
    part = load(spark, sf_dir, "part")
    keys = part.select(
        F.col("p_partkey").alias("part"),
        hash60(F.col("p_partkey").cast("string")).alias("kh"),
    )
    nparts = part.agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    owned = keys.crossJoin(F.broadcast(arr)).select(
        "part",
        F.coalesce(
            # try_element_at: the filtered array is EMPTY for keys hashing
            # past the last vnode (the wraparound case) — ANSI element_at
            # would throw there
            F.try_element_at(
                F.filter(F.col("ring_arr"), lambda s: s["h"] >= F.col("kh")),
                F.lit(1),
            ),
            # try_ here too (r11 fuzz finding, seed 1): an EMPTY node
            # table makes ring_arr itself empty, and the ANSI element_at
            # wraparound fallback aborted the whole job instead of
            # degrading to owner=NULL (the no-nodes answer).
            F.try_element_at("ring_arr", F.lit(1)),
        )["supp"].alias("owner"),
    )
    counts = owned.groupBy("owner").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    return (
        sup.join(counts, sup.s_suppkey == counts.owner, "left")
        .crossJoin(F.broadcast(nparts))
        .select(
            "s_suppkey",
            F.coalesce("n_keys", F.lit(0)).cast("bigint").alias("n_keys"),
            # nullif mirrors the oracle: empty part (seed 67) -> np = 0,
            # and ANSI `div` aborts where the 0-of-0 share should be NULL
            F.expr("coalesce(n_keys, 0) * 1000000 div nullif(np, 0)")
            .cast("bigint")
            .alias("share_q6"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "ml_boosted_stump_split",
    oracle="""
    WITH hist AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sy
        FROM lineitem GROUP BY 1, 2
    ), tot AS (
        SELECT flag, CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(sy) AS BIGINT) AS s
        FROM hist GROUP BY flag
    ), pre AS (
        SELECT h.flag, h.x,
               sum(h.cnt) OVER (PARTITION BY h.flag ORDER BY h.x
                                ROWS UNBOUNDED PRECEDING) AS n_l,
               sum(h.sy) OVER (PARTITION BY h.flag ORDER BY h.x
                               ROWS UNBOUNDED PRECEDING) AS s_l
        FROM hist h
    ), gains AS (
        SELECT p.flag, p.x AS split_x,
               CAST(p.n_l AS BIGINT) AS n_l,
               CAST(t.n - p.n_l AS BIGINT) AS n_r,
               CAST(floor((
                   CAST(p.s_l AS DOUBLE) * CAST(p.s_l AS DOUBLE)
                       / CAST(p.n_l AS DOUBLE)
                 + CAST(t.s - p.s_l AS DOUBLE) * CAST(t.s - p.s_l AS DOUBLE)
                       / CAST(t.n - p.n_l AS DOUBLE)
                 - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                       / CAST(t.n AS DOUBLE)) / 1000000.0) AS BIGINT)
                   AS gain_e6
        FROM pre p JOIN tot t ON t.flag = p.flag
        WHERE t.n - p.n_l > 0
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY flag ORDER BY gain_e6 DESC, split_x) AS rn
        FROM gains
    )
    SELECT flag, split_x, n_l, n_r, gain_e6
    FROM ranked WHERE rn = 1 ORDER BY flag
    """,
    doc="histogram-based greedy split finding for a regression stump "
    "(XGBoost/LightGBM's distributed split search; Chen & Guestrin "
    "2016): ONE (flag, x) histogram groupBy with map-side combine is "
    "the only data pass; candidate splits are prefix sums over the "
    "value lattice, variance-reduction gain = S_L^2/n_L + S_R^2/n_R - "
    "S^2/n from exact BIGINT count/sum pairs (the double conversions "
    "and divides are the same expression both engines), argmax with "
    "the deterministic (gain desc, split asc) rank on the QUANTIZED "
    "gain so the selected split never depends on a sub-micro double "
    "digit. The exact pattern that scales: per-feature histograms "
    "shuffle once, split search is lattice-grain.",
)
def ml_boosted_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sy"),
    )
    tot = hist.groupBy("flag").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("sy").cast("bigint").alias("s"),
    )
    w = (
        Window.partitionBy("flag")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = hist.select(
        "flag",
        "x",
        F.sum("cnt").over(w).alias("n_l"),
        F.sum("sy").over(w).alias("s_l"),
    )
    j = pre.join(tot, "flag").filter(F.col("n") - F.col("n_l") > 0)
    d = lambda c: c.cast("double")
    gain = F.floor(
        (
            d(F.col("s_l")) * d(F.col("s_l")) / d(F.col("n_l"))
            + d(F.col("s") - F.col("s_l"))
            * d(F.col("s") - F.col("s_l"))
            / d(F.col("n") - F.col("n_l"))
            - d(F.col("s")) * d(F.col("s")) / d(F.col("n"))
        )
        / 1000000.0
    ).cast("bigint")
    gains = j.select(
        "flag",
        F.col("x").alias("split_x"),
        F.col("n_l").cast("bigint").alias("n_l"),
        (F.col("n") - F.col("n_l")).cast("bigint").alias("n_r"),
        gain.alias("gain_e6"),
    )
    rw = Window.partitionBy("flag").orderBy(F.desc("gain_e6"), "split_x")
    return (
        gains.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select("flag", "split_x", "n_l", "n_r", "gain_e6")
        .orderBy("flag")
    )


_BFS_ROUNDS = 4


def _bfs_oracle() -> str:
    stages = [
        """
    pp AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS MATERIALIZED (
        SELECT a.p AS u, b.p AS v
        FROM pp a JOIN pp b ON a.o = b.o AND a.p != b.p
        GROUP BY a.p, b.p
    ), deg AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u
    ), seed AS (
        SELECT node FROM deg ORDER BY d DESC, node LIMIT 1
    ), d0 AS (SELECT node, CAST(0 AS BIGINT) AS hop FROM seed)"""
    ]
    for r in range(1, _BFS_ROUNDS + 1):
        prev = " UNION ALL ".join(f"SELECT node FROM d{i}" for i in range(r))
        stages.append(
            f"""
    d{r} AS MATERIALIZED (
        SELECT e.v AS node, CAST({r} AS BIGINT) AS hop
        FROM e JOIN d{r - 1} f ON f.node = e.u
        WHERE e.v NOT IN ({prev})
        GROUP BY e.v
    )"""
        )
    allu = " UNION ALL ".join(
        f"SELECT * FROM d{i}" for i in range(_BFS_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",".join(stages)
        + f"""
    SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM ({allu}) GROUP BY hop ORDER BY hop
    """
    )


@register(
    "graph_bfs_hops",
    oracle=_bfs_oracle(),
    doc=f"single-source BFS hop levels ({_BFS_ROUNDS} rounds) on the "
    "parts-co-ordered graph from the deterministic top-degree seed "
    "(deg desc, node tiebreak) — the frontier-expansion primitive under "
    "reachability / ego-network features: each round joins the frontier "
    "to the edge list (endpoint-keyed), then the visited set rides the "
    "expansion through a shuffle-free union into ONE min(hop) groupBy "
    "(earliest hop wins — the aggregate subsumes the former "
    "distinct + anti-join, r11 union-fold); localCheckpoint per round "
    "keeps lineage linear (the kcore/CC discipline). Fixed round count "
    "so both engines compute the identical level sets. Output: per-hop "
    "node count + id range.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e = co_occurrence_edges(li, "l_orderkey", "l_partkey", directed=True, checkpoint=True)
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    seed = deg.orderBy(F.desc("d"), "node").limit(1).select("node")
    visited = seed.withColumn("hop", F.lit(0).cast("bigint")).localCheckpoint(
        eager=False
    )
    frontier = visited.select("node")
    for r in range(1, _BFS_ROUNDS + 1):
        # One-aggregate round (r11, the CC/PageRank union-fold): the
        # visited set rides the frontier expansion through a shuffle-free
        # union and ONE min(hop) groupBy — a node seen before keeps its
        # earlier hop (min), a node reached first this round gets hop=r,
        # so the aggregate IS the former distinct + left_anti + union
        # (which cost an extra Exchange, an anti SortMergeJoin and two
        # Sorts per round).
        cand = e.join(frontier.withColumnRenamed("node", "u"), "u").select(
            F.col("v").alias("node"), F.lit(r).cast("bigint").alias("hop")
        )
        visited = (
            visited.unionByName(cand)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint(eager=False)
        )
        # read the frontier back out of the CHECKPOINTED aggregate (r10):
        # deriving it from `cand` directly re-executed the round's
        # expansion a second time inside the next round's plan — the
        # recompute-nest class, one extra frontier expansion per round
        # (6.67 -> 4.55 s min-of-3 warm at sf0.1)
        frontier = visited.filter(F.col("hop") == r).select("node")
    return (
        visited.groupBy("hop")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .orderBy("hop")
    )


@register(
    "doc_neyman_allocation",
    oracle="""
    WITH m AS (
        SELECT source, CAST(count(*) AS BIGINT) AS nh,
               CAST(sum(n_chars) AS BIGINT) AS s1,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        FROM documents GROUP BY source
    ), wgt AS (
        SELECT source, nh,
               CAST(nh AS DOUBLE) * sqrt(
                   (CAST(nh AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE))) AS w
        FROM m
    ), q AS (
        -- SORTED double fold for the weight total (the repo's
        -- cross-engine float-sum discipline): quotas feed floor() and a
        -- largest-remainder rank, so a final-ULP difference in tw from
        -- an unordered sum could flip an allocation between engines
        SELECT source, nh, w,
               -- tw = 0 (every stratum zero-variance, e.g. one doc per
               -- source): allocation undefined -> NULL quota/alloc
               -- explicitly (DuckDB NULLs x/0 anyway; Spark would reach
               -- floor(NaN) -> BIGINT abort without the guard)
               CASE WHEN (SELECT list_reduce(list_sort(list(w)),
                                             (a, b) -> a + b)
                          FROM wgt) > 0 THEN
               1000.0 * w / (SELECT list_reduce(list_sort(list(w)),
                                                (a, b) -> a + b)
                             FROM wgt) END AS quota
        FROM wgt
    ), base AS (
        SELECT source, nh, quota,
               CAST(floor(quota) AS BIGINT) AS fl,
               quota - floor(quota) AS rem
        FROM q
    ), lo AS (
        SELECT CAST(1000 - sum(fl) AS BIGINT) AS leftover FROM base
    ), ranked AS (
        SELECT b.*, l.leftover,
               row_number() OVER (ORDER BY b.rem DESC, b.source) AS rk
        FROM base b CROSS JOIN lo l
    )
    SELECT source, nh AS n_docs,
           CAST(floor(1000000.0 * quota / 1000.0) AS BIGINT) AS quota_q6,
           CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc
    FROM ranked ORDER BY source
    """,
    doc="Neyman-optimal stratified sample allocation (Neyman 1934) with "
    "LARGEST-REMAINDER integer apportionment (Hamilton's method): "
    "budget 1000 samples split across sources by N_h * S_h, where S_h "
    "is the population std from exact BIGINT moment sums (the variance "
    "rational is formed in doubles with an identical expression; sqrt "
    "is IEEE-exact). Quotas floor to a base grant and the leftover "
    "goes to the largest fractional remainders (rem desc, source "
    "tiebreak) — sum(alloc) == 1000 exactly by construction. One "
    "moment groupBy is the data pass; apportionment is stratum-grain.",
)
def doc_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    dd = lambda c: F.col(c).cast("double")
    w = dd("nh") * F.sqrt(
        (dd("nh") * dd("s2") - dd("s1") * dd("s1")) / (dd("nh") * dd("nh"))
    )
    wgt = m.select("source", "nh", w.alias("w"))
    # sorted fold, not F.sum: quotas feed floor() and the remainder
    # rank, so the weight total must accumulate in the same (ascending)
    # order on both engines — the repo's float-sum discipline
    tot = wgt.agg(
        F.aggregate(
            F.array_sort(F.collect_list("w")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("tw")
    )
    # tw = 0 (all strata zero-variance): quota undefined -> NULL, which
    # propagates NULL fl/rem/leftover/alloc identically on both engines
    # (rem DESC ranks NULLS LAST with the source tie-break on both);
    # unguarded, 0.0/0.0 = NaN and floor(NaN) aborts under ANSI
    q = wgt.crossJoin(F.broadcast(tot)).select(
        "source",
        "nh",
        F.when(F.col("tw") > 0, 1000.0 * F.col("w") / F.col("tw")).alias("quota"),
    )
    base = q.select(
        "source",
        "nh",
        "quota",
        F.floor("quota").cast("bigint").alias("fl"),
        (F.col("quota") - F.floor("quota")).alias("rem"),
    )
    lo = base.agg((1000 - F.sum("fl")).cast("bigint").alias("leftover"))
    rw = Window.orderBy(F.desc("rem"), "source")
    return (
        base.crossJoin(F.broadcast(lo))
        .withColumn("rk", F.row_number().over(rw))
        .select(
            "source",
            F.col("nh").alias("n_docs"),
            F.floor(1000000.0 * F.col("quota") / 1000.0)
            .cast("bigint")
            .alias("quota_q6"),
            (
                F.col("fl")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("source")
    )


@register(
    "win_rolling_mode",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id,
               CAST(round(value * 100) AS BIGINT) % 50 AS cents,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        FROM events
    ), frames AS (
        SELECT a.user_id, a.event_id, a.rn, b.cents
        FROM v a JOIN v b
          ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 9 AND a.rn
    ), freq AS (
        SELECT user_id, event_id, rn, cents, CAST(count(*) AS BIGINT) AS c
        FROM frames GROUP BY user_id, event_id, rn, cents
    ), pick AS (
        SELECT user_id, event_id, cents, c,
               -- NULLS LAST explicitly: a NULL-valued event is a
               -- countable frame category (cents NULL), and the two
               -- engines default its sort opposite ways (Spark ASC =
               -- nulls first, DuckDB = nulls last) — ties between NULL
               -- and a real value picked different modes under the r11
               -- fuzz null-injection seed. Values win ties over NULL on
               -- both engines now.
               row_number() OVER (
                   PARTITION BY user_id, rn
                   ORDER BY c DESC, cents NULLS LAST) AS rk
        FROM freq
    )
    SELECT user_id, event_id, cents AS mode_cents, c AS mode_count
    FROM pick WHERE rk = 1 ORDER BY user_id, event_id
    """,
    doc="rolling MODE over a 10-row per-user frame (the frequency "
    "statistic cudf's Rolling lacks and pandas computes via apply): the "
    "frame explodes through a rn-band self-join (bounded x10 "
    "expansion, user-keyed), per-frame value counts are one keyed "
    "groupBy, and the winner uses the deterministic (count desc, value "
    "asc) rank — agg_mode_deterministic's tiebreak, framewise. Values "
    "are bucketed to a 50-cent lattice so frames actually repeat. "
    "Every shuffle carries the user key; frame size bounds the "
    "expansion constant.",
)
def win_rolling_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    v = ev.select(
        "user_id",
        "event_id",
        (F.round(F.col("value") * 100).cast("bigint") % 50).alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    a = v.select(
        F.col("user_id").alias("uu"), "event_id", F.col("rn").alias("arn")
    )
    b = v.select(
        F.col("user_id").alias("uu"), F.col("cents"), F.col("rn").alias("brn")
    )
    frames = a.join(b, "uu").filter(
        (F.col("brn") >= F.col("arn") - 9) & (F.col("brn") <= F.col("arn"))
    )
    freq = frames.groupBy(
        F.col("uu").alias("user_id"), "event_id", "arn", "cents"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rw = Window.partitionBy("user_id", "arn").orderBy(
        F.desc("c"), F.asc_nulls_last("cents")
    )
    return (
        freq.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("cents").alias("mode_cents"),
            F.col("c").alias("mode_count"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "ann_hamming_topk",
    oracle="""
    WITH packed AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(generate_series(1, 32),
                   i -> CASE WHEN embedding[i] >= 0
                             THEN CAST(pow(2, i - 1) AS BIGINT)
                             ELSE 0 END)) AS BIGINT) AS w1,
               CAST(list_sum(list_transform(generate_series(33, 64),
                   i -> CASE WHEN embedding[i] >= 0
                             THEN CAST(pow(2, i - 33) AS BIGINT)
                             ELSE 0 END)) AS BIGINT) AS w2
        FROM embeddings
    ), q AS (
        SELECT vec_id AS qid, w1 AS qw1, w2 AS qw2 FROM packed
        WHERE vec_id < 5
    ), scored AS (
        SELECT q.qid, p.vec_id,
               CAST(bit_count(xor(q.qw1, p.w1))
                    + bit_count(xor(q.qw2, p.w2)) AS BIGINT) AS hamming
        FROM q JOIN packed p ON p.vec_id != q.qid
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY hamming, vec_id) AS rk
        FROM scored
    )
    SELECT qid, vec_id, hamming, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10 ORDER BY qid, rk
    """,
    doc="1-bit binary-embedding similarity search (sign quantization + "
    "Hamming ranking — the cheapest ANN tier below emb_quantize_int8's "
    "int8 and ann_pq_topk's PQ; Charikar 2002 simhash hyperplanes "
    "degenerate to coordinate signs): each 64-dim vector packs into TWO "
    "32-bit sign words (2^63 would wrap BIGINT's sign bit), distance = "
    "popcount(xor) per word — exact integers end to end. The pack is "
    "one posexplode + keyed groupBy (a 64x transient expansion, "
    "vector-keyed); queries broadcast to the packed table; per-query "
    "top-10 by the deterministic (hamming, vec_id) rank.",
)
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    pe = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    packed = pe.groupBy("vec_id").agg(
        F.sum(
            F.when(
                (F.col("pos") < 32) & (F.col("v") >= 0),
                F.expr("CAST(pow(2, pos) AS BIGINT)"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("w1"),
        F.sum(
            F.when(
                (F.col("pos") >= 32) & (F.col("v") >= 0),
                F.expr("CAST(pow(2, pos - 32) AS BIGINT)"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("w2"),
    )
    q = packed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("w1").alias("qw1"),
        F.col("w2").alias("qw2"),
    )
    scored = packed.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        (
            F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
            + F.bit_count(F.col("qw2").bitwiseXOR(F.col("w2")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    rw = Window.partitionBy("qid").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select("qid", "vec_id", "hamming", "rk")
        .orderBy("qid", "rk")
    )


@register(
    "misc_roaring_container_plan",
    oracle="""
    WITH vals AS (
        SELECT DISTINCT l_returnflag AS flag,
               CAST(l_orderkey AS BIGINT) AS v
        FROM lineitem
    ), chunked AS (
        SELECT flag, v // 65536 AS chunk, v % 65536 AS lo,
               lag(v % 65536) OVER (
                   PARTITION BY flag, v // 65536 ORDER BY v) AS prev
        FROM vals
    ), per AS (
        SELECT flag, chunk,
               CAST(count(*) AS BIGINT) AS card,
               CAST(sum(CASE WHEN prev IS NULL OR lo != prev + 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        FROM chunked GROUP BY flag, chunk
    )
    SELECT flag, chunk, card, n_runs,
           CAST(2 * card AS BIGINT) AS bytes_array,
           CAST(8192 AS BIGINT) AS bytes_bitmap,
           CAST(2 + 4 * n_runs AS BIGINT) AS bytes_run,
           CASE
             WHEN 2 + 4 * n_runs <= least(2 * card, 8192) THEN 'run'
             WHEN 2 * card <= 8192 THEN 'array'
             ELSE 'bitmap'
           END AS container
    FROM per ORDER BY flag, chunk
    """,
    doc="Roaring-bitmap container planning (Chambi/Lemire 2016 — the "
    "production compressed-bitmap format): per (flag, 2^16 chunk) of "
    "the distinct order-key set, cardinality + run count (gaps-and-"
    "islands lag inside the chunk-keyed window) decide the container — "
    "run (2+4R bytes) beats array (2C) beats bitmap (8 KiB fixed), "
    "ties resolved in that fixed order. The sibling of misc_rle_encode "
    "/ misc_bitpack_for_blocks at the SET-encoding layer; chunk "
    "windows are partition-local, one distinct + one groupBy are the "
    "data passes.",
)
def misc_roaring_container_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_orderkey").cast("bigint").alias("v"),
    ).distinct()
    ch = vals.select(
        "flag",
        F.expr("v div 65536").alias("chunk"),
        (F.col("v") % 65536).alias("lo"),
        "v",
    )
    w = Window.partitionBy("flag", "chunk").orderBy("v")
    per = (
        ch.withColumn("prev", F.lag("lo").over(w))
        .groupBy("flag", "chunk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("card"),
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("lo") != F.col("prev") + 1),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_runs"),
        )
    )
    return per.select(
        "flag",
        "chunk",
        "card",
        "n_runs",
        (2 * F.col("card")).cast("bigint").alias("bytes_array"),
        F.lit(8192).cast("bigint").alias("bytes_bitmap"),
        (2 + 4 * F.col("n_runs")).cast("bigint").alias("bytes_run"),
        F.when(
            2 + 4 * F.col("n_runs") <= F.least(2 * F.col("card"), F.lit(8192)),
            "run",
        )
        .when(2 * F.col("card") <= 8192, "array")
        .otherwise("bitmap")
        .alias("container"),
    ).orderBy("flag", "chunk")


@register(
    "misc_shard_rebalance_pairing",
    oracle="""
    WITH sizes AS (
        SELECT l_suppkey AS supp, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_suppkey
    ), tgt AS (
        SELECT CAST(sum(n) // count(*) AS BIGINT) AS target FROM sizes
    ), lab AS (
        SELECT s.supp, s.n, s.n - t.target AS surplus
        FROM sizes s CROSS JOIN tgt t
    ), over_s AS (
        SELECT supp, surplus,
               row_number() OVER (ORDER BY surplus DESC, supp) AS rk
        FROM lab WHERE surplus > 0
    ), under_s AS (
        SELECT supp, -surplus AS deficit,
               row_number() OVER (ORDER BY surplus ASC, supp) AS rk
        FROM lab WHERE surplus < 0
    )
    SELECT o.rk, o.supp AS from_supp, u.supp AS to_supp,
           CAST(least(o.surplus, u.deficit) AS BIGINT) AS moved
    FROM over_s o JOIN under_s u ON u.rk = o.rk
    ORDER BY o.rk
    """,
    doc="one-round shard rebalance plan by RANK PAIRING: shard sizes vs "
    "the integer mean target; the k-th most-overloaded donor pairs "
    "with the k-th most-underloaded receiver, moving "
    "min(surplus, deficit) — the deterministic single-round "
    "approximation of the greedy balancer (a full greedy is "
    "inherently sequential; rank pairing is one sort + one rank join "
    "and captures the bulk of the imbalance, which is what a shuffle "
    "planner wants at 100 TB). Sizes are one keyed count; everything "
    "else is shard-grain.",
)
def misc_shard_rebalance_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sizes = li.groupBy(F.col("l_suppkey").alias("supp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tgt = sizes.agg(
        F.expr("sum(n) div count(*)").cast("bigint").alias("target")
    )
    lab = sizes.crossJoin(F.broadcast(tgt)).select(
        "supp", "n", (F.col("n") - F.col("target")).alias("surplus")
    )
    wo = Window.orderBy(F.desc("surplus"), "supp")
    wu = Window.orderBy(F.asc("surplus"), "supp")
    over_s = (
        lab.filter(F.col("surplus") > 0)
        .withColumn("rk", F.row_number().over(wo))
        .select("rk", F.col("supp").alias("from_supp"), "surplus")
    )
    under_s = (
        lab.filter(F.col("surplus") < 0)
        .withColumn("rk", F.row_number().over(wu))
        .select("rk", F.col("supp").alias("to_supp"), (-F.col("surplus")).alias("deficit"))
    )
    return (
        over_s.join(under_s, "rk")
        .select(
            "rk",
            "from_supp",
            "to_supp",
            F.least("surplus", "deficit").cast("bigint").alias("moved"),
        )
        .orderBy("rk")
    )


@register(
    "events_markov_entropy_rate",
    oracle="WITH "
    + _markov_cte()
    + """,
    terms AS (
        SELECT c.i, c.j,
               CAST(floor(-1000000000.0
                   * (CAST(coalesce(v5.v, 0) AS DOUBLE) / 1000000.0)
                   * (CAST(c.c AS DOUBLE) / CAST(r.r AS DOUBLE))
                   * log2(CAST(c.c AS DOUBLE) / CAST(r.r AS DOUBLE)))
                   AS BIGINT) AS t9
        FROM c
        JOIN r ON r.i = c.i
        LEFT JOIN v5 ON v5.state = c.i
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM r) AS k,
           CAST(sum(t9) AS BIGINT) AS h_n9,
           CAST(sum(t9) // 1000 AS BIGINT) AS entropy_rate_q6
    FROM terms
    """,
    doc="entropy rate of the event-type Markov chain: H = -sum_i pi_i "
    "sum_j p_ij log2 p_ij, composing the exact fixed-point stationary "
    "vector (events_markov_stationary's 5 integer rounds, reused "
    "verbatim via the shared CTE) with per-CELL nano-quantized float "
    "terms — each (i,j) term is the identical cast/divide/log2 product "
    "on both engines, floored at cell grain so the K^2 sum is "
    "order-free (the text_hellinger_drift discipline, with the log2 "
    "usage the agg_entropy_gini precedent established). The measure of "
    "how predictable a user's next action is — the sequence-"
    "compressibility bound.",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, r, v = _markov_chain(spark, sf_dir)
    d = lambda col: col.cast("double")
    p = d(F.col("c")) / d(F.col("r"))
    t9 = F.floor(
        -1000000000.0
        * (d(F.coalesce("v", F.lit(0))) / 1000000.0)
        * p
        * F.log2(p)
    ).cast("bigint")
    terms = (
        c.join(r, "i")
        .join(v, c.i == v.state, "left")
        .select(t9.alias("t9"))
    )
    kk = r.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    return (
        terms.agg(F.sum("t9").cast("bigint").alias("h_n9"))
        .crossJoin(F.broadcast(kk))
        .select(
            "k",
            "h_n9",
            F.expr("h_n9 div 1000").cast("bigint").alias("entropy_rate_q6"),
        )
    )


def _textrank_oracle() -> str:
    from cudf_spark.operators.graphs import PR_FP_SCALE

    s = PR_FP_SCALE
    head = """
    toks AS (
        SELECT doc_id, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t,
               generate_subscripts(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1)
                   AS pos
        FROM documents
    ), de AS (
        SELECT DISTINCT a.t AS src, b.t AS dst
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.pos - a.pos IN (1, 2)
        WHERE a.t != b.t AND a.t != '' AND b.t != ''
    ), sym AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM de
            UNION ALL SELECT dst AS src, src AS dst FROM de)
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    pr0 AS (SELECT deg.src AS node, CAST(%(s)d AS BIGINT) // nn.n AS pr_q
            FROM deg CROSS JOIN nn)""" % {"s": s}
    steps = []
    for k in range(5):
        steps.append(
            f"""
    c{k + 1} AS MATERIALIZED (
        SELECT sym.dst AS node, sum(pr{k}.pr_q // deg.deg) AS m
        FROM sym JOIN pr{k} ON sym.src = pr{k}.node
                 JOIN deg ON sym.src = deg.src
        GROUP BY sym.dst),
    pr{k + 1} AS (
        SELECT deg.src AS node,
               CAST((CAST({s} AS BIGINT) - CAST({s} AS BIGINT) * 17 // 20)
                        // nn.n
                    + (17 * coalesce(c{k + 1}.m, 0)) // 20 AS BIGINT) AS pr_q
        FROM deg CROSS JOIN nn
        LEFT JOIN c{k + 1} ON deg.src = c{k + 1}.node)"""
        )
    return (
        "WITH "
        + ",".join([head, *steps])
        + """
    SELECT node AS word, pr_q // 100000000 AS score_q7
    FROM pr5 ORDER BY score_q7 DESC, word LIMIT 20
    """
    )


@register(
    "text_textrank_keywords",
    oracle=_textrank_oracle(),
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank "
    "over the word co-occurrence graph (words within distance <= 2 in "
    "a document are linked, symmetrized, distinct) — the graph-"
    "centrality sibling of text_rake_keywords' degree heuristic. The "
    "iteration reuses operators.graphs.pagerank_fixed_point verbatim: "
    "scaled-integer (1e-15-unit) arithmetic, truncating division, 5 "
    "fixed rounds — bit-identical across engines and fold orders. "
    "Data passes: one tokenize + two leads for the edge set; each PR "
    "round is one keyed join + keyed sum. Top-20 words by score.",
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import normalize_text
    from cudf_spark.operators.graphs import pagerank_fixed_point

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias("pos", "t"),
    ).filter(F.col("t") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    withn = toks.select(
        "t",
        F.lead("t", 1).over(w).alias("y1"),
        F.lead("t", 2).over(w).alias("y2"),
    )
    de = (
        withn.select("t", F.col("y1").alias("dst"))
        .unionByName(withn.select("t", F.col("y2").alias("dst")))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("t")))
        .select(F.col("t").alias("src"), "dst")
        .distinct()
    )
    sym = de.unionByName(
        de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    pr = pagerank_fixed_point(sym, damping_num=17, damping_den=20, iters=5)
    return (
        pr.select(
            F.col("node").alias("word"),
            F.expr("pr_q div 100000000").alias("score_q7"),
        )
        .orderBy(F.desc("score_q7"), "word")
        .limit(20)
    )


@register(
    "graph_modularity_score",
    oracle="""
    WITH pp AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), eu AS MATERIALIZED (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
    ), sym AS (
        SELECT u, v FROM eu UNION ALL SELECT v AS u, u AS v FROM eu
    ), l0 AS (
        SELECT DISTINCT u AS node, u AS label FROM sym
    ), n1 AS MATERIALIZED (
        SELECT s.u AS node, l.label, CAST(count(*) AS BIGINT) AS c
        FROM sym s JOIN l0 l ON l.node = s.v GROUP BY s.u, l.label
    ), l1 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, label) AS rn
            FROM n1) WHERE rn = 1
    ), n2 AS MATERIALIZED (
        SELECT s.u AS node, l.label, CAST(count(*) AS BIGINT) AS c
        FROM sym s JOIN l1 l ON l.node = s.v GROUP BY s.u, l.label
    ), l2 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, label) AS rn
            FROM n2) WHERE rn = 1
    ), n3 AS MATERIALIZED (
        SELECT s.u AS node, l.label, CAST(count(*) AS BIGINT) AS c
        FROM sym s JOIN l2 l ON l.node = s.v GROUP BY s.u, l.label
    ), l3 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, label) AS rn
            FROM n3) WHERE rn = 1
    ), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM eu),
    eii AS (
        SELECT la.label, CAST(count(*) AS BIGINT) AS e_in
        FROM eu JOIN l3 la ON la.node = eu.u
                JOIN l3 lb ON lb.node = eu.v
        WHERE la.label = lb.label GROUP BY la.label
    ), deg AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u
    ), ai AS (
        SELECT l3.label, CAST(sum(deg.d) AS BIGINT) AS a
        FROM deg JOIN l3 ON l3.node = deg.node GROUP BY l3.label
    ), terms AS (
        SELECT ai.label,
               CAST(floor(1000000000.0 * (
                   CAST(coalesce(eii.e_in, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
                 - (CAST(ai.a AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
                   * (CAST(ai.a AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))))
                   AS BIGINT) AS t9
        FROM ai LEFT JOIN eii ON eii.label = ai.label CROSS JOIN m
    )
    SELECT (SELECT m FROM m) AS m,
           CAST(count(*) AS BIGINT) AS n_communities,
           CAST(sum(t9) // 1000 AS BIGINT) AS modularity_q6
    FROM terms
    """,
    doc="Newman modularity Q of the 3-round deterministic label-"
    "propagation partition (the quality score FOR "
    "graph_label_propagation's communities; Newman & Girvan 2004): "
    "Q = sum_i (e_ii/m - (a_i/2m)^2) with within-community edge counts "
    "and degree sums as exact BIGINTs, each community's term computed "
    "as the identical double expression and floor-quantized at "
    "COMMUNITY grain so the final sum is order-free (never a sorted "
    "fold over an unbounded community list). All joins are node- or "
    "label-keyed; LPA rounds are fixed at 3 (lineage bounded).",
)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # ONE materialization: the symmetric table (checkpointed inside
    # co_occurrence_edges) feeds the LPA rounds and the degree sum
    # directly; the undirected list eu re-derives as a cheap u<v filter
    # over the same blocks instead of a second materialization.
    sym = co_occurrence_edges(
        li, "l_orderkey", "l_partkey", directed=True, checkpoint=True
    )
    eu = sym.filter(F.col("u") < F.col("v"))
    # round 9: max_by argmax replaces the row_number window per round —
    # pure hash aggregate (map-side partials, no sort exchange) with the
    # identical (count DESC, label ASC) winner; see
    # graph_label_propagation. Only the FINAL labels checkpoint remains:
    # it is consumed by both endpoint joins of the fused el table below.
    # Round-0 closed form (r10): identity initial labels make every
    # neighbour label distinct, so the argmax winner is min(v) — one
    # groupBy replaces distinct + join + two-level agg (see LPA).
    labels = sym.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("label")
    )
    for r in range(2):
        nb = sym.join(labels.withColumnRenamed("node", "v"), "v").select(
            F.col("u").alias("node"), "label"
        )
        cnt = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = cnt.groupBy("node").agg(
            F.max_by("label", F.struct(F.col("c"), -F.col("label"))).alias(
                "label"
            )
        )
        if r == 1:
            labels = labels.localCheckpoint(eager=False)
    la = labels.withColumnRenamed("node", "u").withColumnRenamed("label", "lu")
    lb = labels.withColumnRenamed("node", "v").withColumnRenamed("label", "lv")
    # round 10 fusion (VERDICT item 2): ONE per-edge label table feeds m,
    # eii AND ai. a_label = sum of degrees over the label's nodes = the
    # count of (edge, endpoint) incidences with that endpoint label —
    # explode(array(lu, lv)) over eu — so the former deg groupBy over the
    # 2|E|-row sym table and the deg-join-labels pass disappear entirely.
    el = eu.join(la, "u").join(lb, "v").select("lu", "lv").localCheckpoint(
        eager=False
    )
    m = el.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    eii = (
        el.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    ai = (
        el.select(F.explode(F.array("lu", "lv")).alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    )
    dd = lambda c: F.col(c).cast("double")
    half = dd("a") / (2.0 * dd("m"))
    t9 = F.floor(
        1000000000.0
        * (dd("e_in2") / dd("m") - half * half)
    ).cast("bigint")
    terms = (
        ai.join(eii, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in2"),
            "a",
            "m",
        )
        .select(t9.alias("t9"))
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.sum("t9").cast("bigint").alias("s9"),
    ).crossJoin(F.broadcast(m)).select(
        "m",
        "n_communities",
        F.expr("s9 div 1000").cast("bigint").alias("modularity_q6"),
    )


@register(
    "ml_calibration_ece",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS actual,
               {_lang_scores_sql()}
        FROM documents
    ), conf AS (
        SELECT actual,
           CASE WHEN s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
                WHEN s_es >= greatest(s_de, s_fr, s_zh)       THEN 'es'
                WHEN s_de >= greatest(s_fr, s_zh)             THEN 'de'
                WHEN s_fr >= s_zh                             THEN 'fr'
                ELSE 'zh' END AS predicted,
           CASE WHEN s_en + s_es + s_de + s_fr + s_zh > 0
                THEN CAST(greatest(s_en, s_es, s_de, s_fr, s_zh) AS BIGINT)
                     * 1000000
                     // (s_en + s_es + s_de + s_fr + s_zh)
                ELSE 200000 END AS conf_q6
        FROM scored
    ), binned AS (
        SELECT least(conf_q6 // 100000, 9) AS bin,
               CASE WHEN actual = predicted THEN 1 ELSE 0 END AS ok,
               conf_q6
        FROM conf
    ), per AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ok) AS BIGINT) AS n_correct,
               CAST(sum(conf_q6) AS BIGINT) AS conf_sum_q6
        FROM binned GROUP BY bin
    ), tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n,
               CAST(sum(abs(n_correct * 1000000 - conf_sum_q6)) AS BIGINT)
                   AS gap_sum
        FROM per
    )
    SELECT p.bin, p.n_docs, p.n_correct,
           CAST(p.n_correct * 1000000 // p.n_docs AS BIGINT) AS acc_q6,
           CAST(p.conf_sum_q6 // p.n_docs AS BIGINT) AS avg_conf_q6,
           CAST(abs(p.n_correct * 1000000 - p.conf_sum_q6) // p.n_docs
                AS BIGINT) AS gap_q6,
           CAST(t.gap_sum // t.n AS BIGINT) AS ece_q6
    FROM per p CROSS JOIN tot t
    ORDER BY p.bin
    """,
    doc="expected calibration error (ECE; Naeini 2015 / Guo 2017) of "
    "the language-ID predictor: per-document confidence = max marker "
    "score over total marker hits as an EXACT micro-unit rational "
    "(uniform 1/5 for zero-evidence docs), 10 confidence deciles, "
    "per-bin |accuracy - confidence| gap and the N-weighted ECE — "
    "every number integer arithmetic on exact counts, zero float. The "
    "reliability-diagram head every model-quality pipeline reports "
    "next to P/R/F1 (text_lang_confusion_eval) and kappa "
    "(stats_cohens_kappa). One corpus scan; bins are constant grain.",
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.queries.text import lang_conf, lang_pred, lang_scores

    d = load(spark, sf_dir, "documents")
    sc = lang_scores(F.col("text"))
    pred = lang_pred(sc)
    mx, total = lang_conf(sc)
    # bind score columns first: the truncating `div` lives in expr
    # strings, which can't see python Column objects
    base = d.select(
        F.col("lang").alias("actual"),
        pred.alias("predicted"),
        mx.cast("bigint").alias("mx"),
        total.cast("bigint").alias("tt"),
    )
    conf_q6 = (
        F.when(F.col("tt") > 0, F.expr("mx * 1000000 div tt"))
        .otherwise(F.lit(200000))
        .cast("bigint")
    )
    binned = base.select(
        conf_q6.alias("conf_q6"),
        F.when(F.col("actual") == F.col("predicted"), 1).otherwise(0).alias("ok"),
    ).select(
        F.expr("CAST(least(conf_q6 div 100000, 9) AS BIGINT)").alias("bin"),
        "conf_q6",
        "ok",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ok").cast("bigint").alias("n_correct"),
        F.sum("conf_q6").cast("bigint").alias("conf_sum_q6"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.sum(F.abs(F.col("n_correct") * 1000000 - F.col("conf_sum_q6")))
        .cast("bigint")
        .alias("gap_sum"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_docs",
            "n_correct",
            F.expr("n_correct * 1000000 div n_docs").cast("bigint").alias("acc_q6"),
            F.expr("conf_sum_q6 div n_docs").cast("bigint").alias("avg_conf_q6"),
            F.expr("abs(n_correct * 1000000 - conf_sum_q6) div n_docs")
            .cast("bigint")
            .alias("gap_q6"),
            F.expr("gap_sum div n").cast("bigint").alias("ece_q6"),
        )
        .orderBy("bin")
    )


def _merkle_oracle() -> str:
    from cudf_spark.functions.hashing import hash60_sql

    row_h = hash60_sql(
        "concat_ws('|', CAST(event_id AS VARCHAR), "
        "CAST(user_id AS VARCHAR), event_type, "
        "CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), "
        "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR))"
    )
    combine = hash60_sql(
        "CAST(l AS VARCHAR) || '|' || CAST(rr AS VARCHAR)"
    )
    stages = [
        f"""
    rows_h AS (SELECT {row_h} AS h FROM events),
    leaves AS (
        SELECT s.idx, coalesce(b.hx, CAST(0 AS BIGINT)) AS h
        FROM (SELECT unnest(generate_series(0, 255)) AS idx) s
        LEFT JOIN (SELECT h % 256 AS idx, CAST(bit_xor(h) AS BIGINT) AS hx
                   FROM rows_h GROUP BY h % 256) b ON b.idx = s.idx
    ), l0 AS (SELECT idx, h FROM leaves)"""
    ]
    for k in range(1, 9):
        stages.append(
            f"""
    l{k} AS MATERIALIZED (
        SELECT idx // 2 AS idx, {combine} AS h
        FROM (SELECT idx,
                     max(CASE WHEN idx % 2 = 0 THEN h END)
                         OVER (PARTITION BY idx // 2) AS l,
                     max(CASE WHEN idx % 2 = 1 THEN h END)
                         OVER (PARTITION BY idx // 2) AS rr
              FROM l{k - 1})
        WHERE idx % 2 = 0
    )"""
        )
    lvls = " UNION ALL ".join(
        f"SELECT {k} AS level, CAST(count(*) AS BIGINT) AS n_nodes, "
        f"CAST(bit_xor(h) AS BIGINT) AS level_xor FROM l{k}"
        for k in range(9)
    )
    return "WITH " + ",".join(stages) + f" SELECT * FROM ({lvls}) ORDER BY level"


@register(
    "misc_merkle_bucket_tree",
    oracle=_merkle_oracle(),
    doc="Merkle bucket tree over the events table (the hierarchical "
    "integrity structure Cassandra/Dynamo anti-entropy uses — one step "
    "past misc_table_fingerprint's flat XOR: a differing ROOT localises "
    "to the differing 2^16-of-256 bucket in log steps): canonical "
    "per-row hash60 -> 256 leaf buckets by h mod 256 (XOR within a "
    "bucket is order-free; empty buckets pin to 0 via an explicit "
    "spine), then 8 pairwise hash60(left|right) levels to the root. "
    "The row scan is the only data pass; every level is bucket grain. "
    "Output: per-level node count + level XOR (level 8 = the root).",
)
def misc_merkle_bucket_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.hashing import hash60
    from cudf_spark.queries.analytics2 import _event_row_hash

    ev = load(spark, sf_dir, "events")
    rows_h = ev.select(_event_row_hash().alias("h"))
    buckets = rows_h.groupBy((F.col("h") % 256).alias("idx")).agg(
        F.expr("bit_xor(h)").cast("bigint").alias("hx")
    )
    spine = spark.range(256).select(F.col("id").cast("bigint").alias("idx"))
    level = spine.join(buckets, "idx", "left").select(
        "idx", F.coalesce("hx", F.lit(0)).cast("bigint").alias("h")
    )
    out = [
        level.agg(
            F.lit(0).cast("bigint").alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.expr("bit_xor(h)").cast("bigint").alias("level_xor"),
        )
    ]
    for k in range(1, 9):
        pairs = level.groupBy(F.expr("idx div 2").alias("idx")).agg(
            F.max(F.when(F.col("idx") % 2 == 0, F.col("h"))).alias("l"),
            F.max(F.when(F.col("idx") % 2 == 1, F.col("h"))).alias("rr"),
        )
        level = pairs.select(
            "idx",
            hash60(
                F.concat_ws(
                    "|", F.col("l").cast("string"), F.col("rr").cast("string")
                )
            ).alias("h"),
        )
        out.append(
            level.agg(
                F.lit(k).cast("bigint").alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                F.expr("bit_xor(h)").cast("bigint").alias("level_xor"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("level")


@register(
    "events_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS fd
        FROM events GROUP BY user_id
    ), cohorts AS (
        SELECT user_id, fd, (day(fd) - 1) // 7 AS cohort FROM firsts
    ), sizes AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        FROM cohorts GROUP BY cohort
    ), rev AS (
        SELECT c.cohort,
               CAST(CAST(e.ts AS TIMESTAMP) AS DATE) - c.fd AS age,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events e JOIN cohorts c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY c.cohort, CAST(CAST(e.ts AS TIMESTAMP) AS DATE) - c.fd
    ), curve AS (
        SELECT cohort, CAST(age AS BIGINT) AS age, rev_cents,
               CAST(sum(rev_cents) OVER (
                   PARTITION BY cohort ORDER BY age
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT cv.cohort, cv.age, s.n_users, cv.rev_cents, cv.cum_cents,
           CAST(cv.cum_cents // s.n_users AS BIGINT) AS ltv_cents_per_user
    FROM curve cv JOIN sizes s ON s.cohort = cv.cohort
    ORDER BY cv.cohort, cv.age
    """,
    doc="cohort LTV accumulation curve (the revenue twin of "
    "events_retention_cohorts): users cohorted by first-seen week, "
    "purchase revenue in exact cents bucketed by account AGE in days, "
    "cumulative per-cohort revenue via a cohort-keyed window, per-user "
    "LTV by truncating division over the cohort size. Day-grain "
    "output; the revenue groupBy is the only event-scale pass and the "
    "cumsum runs on the (cohort, age) lattice.",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("fd"))
    cohorts = firsts.select(
        "user_id", "fd", F.expr("(day(fd) - 1) div 7").alias("cohort")
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.to_date("ts"), F.col("fd")).cast("bigint").alias("age"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = rev.withColumn(
        "cum_cents", F.sum("rev_cents").over(w).cast("bigint")
    )
    return (
        curve.join(sizes, "cohort")
        .select(
            "cohort",
            "age",
            "n_users",
            "rev_cents",
            "cum_cents",
            F.expr("cum_cents div n_users").cast("bigint").alias(
                "ltv_cents_per_user"
            ),
        )
        .orderBy("cohort", "age")
    )


_MMR_CANDS = 20
_MMR_PICKS = 5


def _mmr_oracle() -> str:
    from cudf_spark.queries.similarity import _sql_cosine

    head = f"""
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id, e.embedding,
               CAST(floor(1000000000.0 * {_sql_cosine('e.embedding', 'q.qv')})
                    AS BIGINT) AS qs
        FROM embeddings e, q WHERE e.vec_id != 0
    ), c AS MATERIALIZED (
        SELECT vec_id, embedding, qs FROM (
            SELECT *, row_number() OVER (ORDER BY qs DESC, vec_id) AS rn
            FROM scored) WHERE rn <= {_MMR_CANDS}
    ), pairs AS MATERIALIZED (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(floor(1000000000.0
                    * {_sql_cosine('a.embedding', 'b.embedding')}) AS BIGINT)
                   AS ps
        FROM c a JOIN c b ON a.vec_id != b.vec_id
    ),
    sel1 AS (SELECT vec_id, qs, 7 * qs AS score FROM c
             ORDER BY score DESC, vec_id LIMIT 1)"""
    steps = []
    for k in range(2, _MMR_PICKS + 1):
        selected = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, k)
        )
        steps.append(
            f"""
    sel{k} AS (
        SELECT r.vec_id, r.qs, 7 * r.qs - 3 * max(p.ps) AS score
        FROM c r JOIN pairs p
          ON p.ia = r.vec_id AND p.ib IN ({selected})
        WHERE r.vec_id NOT IN ({selected})
        GROUP BY r.vec_id, r.qs
        ORDER BY score DESC, r.vec_id LIMIT 1)"""
        )
    final = " UNION ALL ".join(
        f"SELECT {k} AS rk, vec_id, qs, CAST(score AS BIGINT) AS score "
        f"FROM sel{k}"
        for k in range(1, _MMR_PICKS + 1)
    )
    return "WITH " + ",".join([head, *steps]) + f" SELECT * FROM ({final}) ORDER BY rk"


@register(
    "emb_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="maximal marginal relevance reranking (Carbonell & Goldstein "
    "1998 — the diversity-vs-relevance greedy every retrieval pipeline "
    "runs after ANN): from the top-20 cosine candidates, pick 5 items "
    "maximising 0.7*sim(q,d) - 0.3*max_{s in selected} sim(d,s), "
    "entirely in nano-quantized INTEGER scores (7*qs - 3*pen with "
    "deterministic (score desc, id) argmax — per-pair cosines floor at "
    "pair grain, so no float ever crosses a round boundary). Scale "
    "shape: the greedy runs on the BOUNDED candidate set the ANN tier "
    "already produced (candidate and pair tables are K and K^2 rows); "
    "the only data-scale pass is the initial query-similarity scan. "
    "Spark loops the 5 rounds on the K-row frame; the oracle unrolls "
    "them as CTEs.",
)
def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)).select(
        "vec_id",
        "embedding",
        F.floor(1000000000.0 * cosine(F.col("embedding"), F.col("qv")))
        .cast("bigint")
        .alias("qs"),
    )
    rw = Window.orderBy(F.desc("qs"), "vec_id")
    c = (
        scored.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= _MMR_CANDS)
        .select("vec_id", "embedding", "qs")
        .localCheckpoint(eager=False)
    )
    ca = c.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    cb = c.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = (
        ca.join(cb, F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.floor(1000000000.0 * cosine(F.col("ea"), F.col("eb")))
            .cast("bigint")
            .alias("ps"),
        )
        .localCheckpoint(eager=False)
    )
    picks = []
    first = (
        c.select("vec_id", "qs", (7 * F.col("qs")).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(1)
        .withColumn("rk", F.lit(1).cast("bigint"))
    )
    picks.append(first)
    selected = first.select("vec_id")
    for k in range(2, _MMR_PICKS + 1):
        pen = (
            pairs.join(selected.withColumnRenamed("vec_id", "ib"), "ib")
            .groupBy(F.col("ia").alias("vec_id"))
            .agg(F.max("ps").alias("pen"))
        )
        nxt = (
            c.join(selected, "vec_id", "left_anti")
            .join(pen, "vec_id")
            .select(
                "vec_id",
                "qs",
                (7 * F.col("qs") - 3 * F.col("pen")).alias("score"),
            )
            .orderBy(F.desc("score"), "vec_id")
            .limit(1)
            .withColumn("rk", F.lit(k).cast("bigint"))
        )
        picks.append(nxt)
        selected = selected.unionByName(nxt.select("vec_id")).localCheckpoint(
            eager=False
        )
    res = picks[0]
    for p in picks[1:]:
        res = res.unionByName(p)
    return res.select(
        "rk", "vec_id", "qs", F.col("score").cast("bigint").alias("score")
    ).orderBy("rk")


@register(
    "graph_assortativity",
    oracle="""
    WITH pp AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), eu AS MATERIALIZED (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
    ), sym AS (
        SELECT u, v FROM eu UNION ALL SELECT v AS u, u AS v FROM eu
    ), deg AS (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u
    ), ed AS (
        SELECT du.d AS x, dv.d AS y
        FROM sym JOIN deg du ON du.node = sym.u
                 JOIN deg dv ON dv.node = sym.v
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM ed
    )
    SELECT m, CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           -- zero-variance guard (REGULAR graph: all degrees equal) —
           -- r is undefined and the Infinity -> BIGINT cast aborts;
           -- guard in DOUBLE (the BIGINT product would overflow first)
           CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
           CAST(floor(1000000.0
               * (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
               AS BIGINT) END AS assortativity_q6
    FROM s
    """,
    doc="degree assortativity (Newman 2002): the Pearson correlation of "
    "endpoint degrees over the DIRECTED edge list of the symmetrized "
    "parts-co-ordered graph — positive = hubs link hubs, negative = "
    "hub-and-spoke. Exact BIGINT moment sums in one edge-grain "
    "aggregate after two node-keyed degree joins; the final r uses "
    "double casts with an identical expression and separate sqrt "
    "factors (the stats_kendall_tau_binned overflow discipline — the "
    "variance products would not fit BIGINT at cluster scale).",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # checkpoint: sym feeds the degree table AND the edge-grain double
    # join (which references deg twice) — unmaterialized, the
    # co-occurrence self-join re-nests ~4x into the one plan (round-9
    # graph audit, same finding as LPA/triangle).
    sym = co_occurrence_edges(
        li, "l_orderkey", "l_partkey", directed=True, checkpoint=True
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    ed = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("y")), "v")
        .select("x", "y")
    )
    s = ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")
    # zero-variance guard (regular graph): r undefined -> NULL; guard in
    # DOUBLE — a BIGINT m*sxx product would itself overflow-abort first
    r = F.when(
        (d("m") * d("sxx") - d("sx") * d("sx") > 0)
        & (d("m") * d("syy") - d("sy") * d("sy") > 0),
        F.floor(
            1000000.0
            * (d("m") * d("sxy") - d("sx") * d("sy"))
            / (
                F.sqrt(d("m") * d("sxx") - d("sx") * d("sx"))
                * F.sqrt(d("m") * d("syy") - d("sy") * d("sy"))
            )
        ).cast("bigint"),
    )
    return s.crossJoin(F.broadcast(nn)).select(
        "m", "n_nodes", r.alias("assortativity_q6")
    )


_DELTA_TOPW = 20


@register(
    "text_burrows_delta",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
        FROM documents
    ), cnt AS (
        SELECT source, t, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE t != '' GROUP BY source, t
    ), topw AS (
        SELECT t FROM (
            SELECT t, CAST(sum(c) AS BIGINT) AS g,
                   row_number() OVER (ORDER BY sum(c) DESC, t) AS rn
            FROM cnt GROUP BY t) WHERE rn <= {_DELTA_TOPW}
    ), ns AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source
    ), spine AS (
        SELECT ns.source, topw.t, ns.n FROM ns CROSS JOIN topw
    ), f AS (
        SELECT s.source, s.t,
               CAST(coalesce(c.c, 0) * 1000000 // s.n AS BIGINT) AS fq
        FROM spine s LEFT JOIN cnt c
          ON c.source = s.source AND c.t = s.t
    ), wstat AS (
        SELECT t, CAST(count(*) AS BIGINT) AS k,
               CAST(sum(fq) AS BIGINT) AS s1,
               CAST(sum(fq * fq) AS BIGINT) AS s2
        FROM f GROUP BY t
    ), z AS (
        SELECT f.source, f.t,
               CAST(floor(1000000.0
                   * (CAST(f.fq AS DOUBLE) - CAST(w.s1 AS DOUBLE)
                          / CAST(w.k AS DOUBLE))
                   / sqrt((CAST(w.k AS DOUBLE) * CAST(w.s2 AS DOUBLE)
                           - CAST(w.s1 AS DOUBLE) * CAST(w.s1 AS DOUBLE))
                          / (CAST(w.k AS DOUBLE) * CAST(w.k AS DOUBLE))))
                   AS BIGINT) AS zq
        FROM f JOIN wstat w ON w.t = f.t
        WHERE w.k * w.s2 - w.s1 * w.s1 > 0
    ), delta AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(sum(abs(a.zq - b.zq)) AS BIGINT) AS sum_absdz,
               CAST(count(*) AS BIGINT) AS n_words
        FROM z a JOIN z b ON b.t = a.t AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, n_words,
           CAST(sum_absdz // n_words AS BIGINT) AS delta_q6
    FROM delta ORDER BY delta_q6, src_a, src_b LIMIT 10
    """,
    doc="Burrows' Delta stylometric distance (Burrows 2002 — the "
    "authorship-attribution standard): top-20 corpus words, per-source "
    "relative frequencies as EXACT per-million integers, per-word "
    "z-scores across sources (population sigma from exact integer "
    "moments; the double expression is identical on both engines and "
    "floor-quantized at (source, word) grain so the pairwise sums are "
    "pure BIGINT), Delta(a,b) = mean |z_a - z_b|. The word spine "
    "cross-join guarantees missing words score as zero frequency "
    "rather than silently dropping. Output: 10 most stylometrically "
    "similar source pairs. All joins word- or source-keyed; the "
    "tokenize scan is the only corpus pass.",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.functions.textfns import normalize_text

    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select(
            "source",
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    gw = Window.orderBy(F.desc("g"), "t")
    topw = (
        cnt.groupBy("t")
        .agg(F.sum("c").cast("bigint").alias("g"))
        .withColumn("rn", F.row_number().over(gw))
        .filter(F.col("rn") <= _DELTA_TOPW)
        .select("t")
    )
    ns = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    spine = ns.crossJoin(F.broadcast(topw))
    f = spine.join(cnt, ["source", "t"], "left").select(
        "source",
        "t",
        F.expr("coalesce(c, 0) * 1000000 div n").cast("bigint").alias("fq"),
    )
    wstat = f.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("fq").cast("bigint").alias("s1"),
        F.sum(F.col("fq") * F.col("fq")).cast("bigint").alias("s2"),
    )
    dd = lambda c: F.col(c).cast("double")
    zq = F.floor(
        1000000.0
        * (dd("fq") - dd("s1") / dd("k"))
        / F.sqrt((dd("k") * dd("s2") - dd("s1") * dd("s1")) / (dd("k") * dd("k")))
    ).cast("bigint")
    z = (
        f.join(wstat, "t")
        .filter(F.col("k") * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        .select("source", "t", zq.alias("zq"))
    )
    za = z.select(
        F.col("source").alias("src_a"), "t", F.col("zq").alias("za")
    )
    zb = z.select(
        F.col("source").alias("src_b"), F.col("t").alias("t2"), F.col("zq").alias("zb")
    )
    delta = (
        za.join(zb, (F.col("t") == F.col("t2")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.abs(F.col("za") - F.col("zb"))).cast("bigint").alias("sum_absdz"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
    )
    return (
        delta.select(
            "src_a",
            "src_b",
            "n_words",
            F.expr("sum_absdz div n_words").cast("bigint").alias("delta_q6"),
        )
        .orderBy("delta_q6", "src_a", "src_b")
        .limit(10)
    )


@register(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, CAST(min(c) AS BIGINT) AS md
        FROM (
            SELECT event_type, c,
                   sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cnt) OVER (PARTITION BY event_type) AS n
            FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
                  FROM daily GROUP BY event_type, c))
        WHERE 2 * cum >= n GROUP BY event_type
    ), signed AS (
        SELECT d.event_type, d.day,
               CASE WHEN d.c > m.md THEN 1 ELSE 0 END AS s
        FROM daily d JOIN med m ON m.event_type = d.event_type
    ), runs AS (
        SELECT event_type, s,
               CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
                         IS DISTINCT FROM s THEN 1 ELSE 0 END AS brk
        FROM signed
    ), agg AS (
        SELECT event_type,
               CAST(sum(brk) AS BIGINT) AS r,
               CAST(sum(s) AS BIGINT) AS n1,
               CAST(count(*) - sum(s) AS BIGINT) AS n0,
               CAST(count(*) AS BIGINT) AS n
        FROM runs GROUP BY event_type
    )
    SELECT event_type, n, n1, n0, r AS n_runs,
           CAST(floor(1000000.0
               * (CAST(r AS DOUBLE)
                  - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                         / CAST(n AS DOUBLE)))
               / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                         - CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))))
               AS BIGINT) AS z_q6
    FROM agg WHERE n1 > 0 AND n0 > 0 ORDER BY event_type
    """,
    doc="Wald-Wolfowitz runs test for temporal randomness of daily "
    "volumes (above/below the exact lower-median rank rule; ties count "
    "below): run count via the lag-change flag (IS DISTINCT FROM makes "
    "the first row start run 1), expected runs 1 + 2*n1*n0/n and its "
    "variance in an identical double expression, z floor-quantized. "
    "The sequential-dependence check a forecasting pipeline runs on "
    "residuals — day grain after one keyed count, the dt_resample "
    "family's bounded-calendar discipline.",
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hist = daily.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    med = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(wall))
        .filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("c").cast("bigint").alias("md"))
    )
    signed = daily.join(med, "event_type").select(
        "event_type",
        "day",
        F.when(F.col("c") > F.col("md"), 1).otherwise(0).alias("s"),
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    runs = signed.withColumn(
        "brk",
        F.when(
            ~F.lag("s").over(wd).eqNullSafe(F.col("s")), 1
        ).otherwise(0),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("brk").cast("bigint").alias("r"),
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n0"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    d = lambda c: F.col(c).cast("double")
    two_nn = 2.0 * d("n1") * d("n0")
    z = F.floor(
        1000000.0
        * (d("r") - (1.0 + two_nn / d("n")))
        / F.sqrt(
            two_nn * (two_nn - d("n")) / (d("n") * d("n") * (d("n") - 1.0))
        )
    ).cast("bigint")
    return (
        agg.filter((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            "event_type",
            "n",
            "n1",
            "n0",
            F.col("r").alias("n_runs"),
            z.alias("z_q6"),
        )
        .orderBy("event_type")
    )


@register(
    "ml_knn_classifier_eval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS actual
        FROM embeddings WHERE vec_id < 50
    ), scored AS (
        SELECT q.qid, q.actual, e.vec_id, e.label,
               CAST(floor(1000000000.0 *
                   (list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) * sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))))) AS BIGINT) AS cq
        FROM q JOIN embeddings e ON e.vec_id != q.qid
    ), knn AS (
        SELECT qid, actual, label FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cq DESC, vec_id) AS rn
            FROM scored) WHERE rn <= 5
    ), votes AS (
        SELECT qid, actual, label, CAST(count(*) AS BIGINT) AS v
        FROM knn GROUP BY qid, actual, label
    ), pred AS (
        SELECT qid, actual, label AS predicted FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY v DESC, label) AS rk
            FROM votes) WHERE rk = 1
    ), per AS (
        SELECT actual AS label, CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM pred GROUP BY actual
    ), tot AS (
        SELECT CAST(sum(n_eval) AS BIGINT) AS n,
               CAST(sum(n_correct) AS BIGINT) AS c
        FROM per
    )
    SELECT p.label, p.n_eval, p.n_correct,
           CAST(p.n_correct * 1000000 // p.n_eval AS BIGINT) AS acc_q6,
           CAST(t.c * 1000000 // t.n AS BIGINT) AS overall_acc_q6
    FROM per p CROSS JOIN tot t
    ORDER BY p.label
    """,
    doc="leave-one-out 5-NN classifier accuracy over the embedding "
    "labels (the eval head beside ml_nearest_centroid_eval — instance-"
    "based vs centroid-based): exact nano-quantized cosine ranking "
    "with the (cq desc, vec_id) tiebreak, majority vote with the "
    "(count desc, label) tiebreak, per-label and overall accuracy as "
    "exact integer rationals. The 50-query evaluation panel keeps the "
    "similarity join bounded (queries broadcast to the vector scan — "
    "at 100 TB the eval panel is always a bounded sample; the ANN "
    "tiers handle full-corpus search).",
)
def ml_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("actual"),
    )
    scored = e.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "actual",
        "vec_id",
        "label",
        F.floor(1000000000.0 * cosine(F.col("embedding"), F.col("qv")))
        .cast("bigint")
        .alias("cq"),
    )
    rw = Window.partitionBy("qid").orderBy(F.desc("cq"), "vec_id")
    knn = (
        scored.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= 5)
        .select("qid", "actual", "label")
    )
    votes = knn.groupBy("qid", "actual", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    vw = Window.partitionBy("qid").orderBy(F.desc("v"), "label")
    pred = (
        votes.withColumn("rk", F.row_number().over(vw))
        .filter(F.col("rk") == 1)
        .select("qid", "actual", F.col("label").alias("predicted"))
    )
    per = pred.groupBy(F.col("actual").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.when(F.col("actual") == F.col("predicted"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
    )
    tot = per.agg(
        F.sum("n_eval").cast("bigint").alias("n"),
        F.sum("n_correct").cast("bigint").alias("c"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n_eval",
            "n_correct",
            F.expr("n_correct * 1000000 div n_eval").cast("bigint").alias("acc_q6"),
            F.expr("c * 1000000 div n").cast("bigint").alias("overall_acc_q6"),
        )
        .orderBy("label")
    )


@register(
    "er_blocked_linkage",
    oracle=f"""
    WITH names AS (
        SELECT DISTINCT p_name AS name,
               string_split(p_name, ' ')[1] AS w1
        FROM part
    ), blocked AS (
        SELECT name, {_soundex_sql('w1')} AS block FROM names
    ), pairs AS (
        SELECT a.block, a.name AS name_a, b.name AS name_b,
               levenshtein(a.name, b.name) AS dist
        FROM blocked a JOIN blocked b
          ON b.block = a.block AND a.name < b.name
    )
    SELECT b.block,
           CAST(count(DISTINCT b.name) AS BIGINT) AS n_names,
           CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(p.n_matches, 0) AS BIGINT) AS n_matches
    FROM blocked b
    LEFT JOIN (
        SELECT block, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matches
        FROM pairs GROUP BY block) p ON p.block = b.block
    GROUP BY b.block, p.n_pairs, p.n_matches
    ORDER BY b.block
    """,
    doc="blocked entity resolution (the record-linkage pattern: "
    "Fellegi-Sunter blocking + string comparison): distinct part names "
    "block on the SOUNDEX of their first word (phonetic blocking keeps "
    "typo variants together while cutting the pair space from O(N^2) "
    "to sum of block^2 — THE scale move in linkage), candidate pairs "
    "compare by Levenshtein <= 3. Spark uses builtin soundex + "
    "levenshtein; the oracle reuses _soundex_sql and DuckDB's "
    "levenshtein. Output per block: name count, candidate pairs, "
    "matches. At 100 TB the block key is the shuffle key and the "
    "block-size cap (dedup_minhash's max_bucket_size discipline) "
    "bounds the quadratic term.",
)
def er_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("name")).distinct().select(
        "name", F.split("name", " ").getItem(0).alias("w1")
    )
    blocked = names.select("name", F.soundex("w1").alias("block"))
    a = blocked.select(F.col("block"), F.col("name").alias("name_a"))
    b = blocked.select(F.col("block").alias("b2"), F.col("name").alias("name_b"))
    pairs = (
        a.join(b, (F.col("block") == F.col("b2")) & (F.col("name_a") < F.col("name_b")))
        .select(
            "block",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
    )
    pstats = pairs.groupBy("block").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("dist") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_matches"),
    )
    return (
        blocked.groupBy("block")
        .agg(F.countDistinct("name").cast("bigint").alias("n_names"))
        .join(pstats, "block", "left")
        .select(
            "block",
            "n_names",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        )
        .orderBy("block")
    )


@register(
    "dt_fiscal_calendar_445",
    oracle="""
    WITH o AS (
        SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS d,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), fy AS (
        SELECT d, cents,
               CASE WHEN d >= make_date(year(d), 2, 1) THEN year(d)
                    ELSE year(d) - 1 END AS fyear
        FROM o
    ), wk AS (
        SELECT fyear, cents,
               least((d - make_date(fyear, 2, 1)) // 7, 51) AS w
        FROM fy
    ), per AS (
        SELECT fyear, cents, w,
               CASE WHEN w < 4 THEN 1 WHEN w < 8 THEN 2 WHEN w < 13 THEN 3
                    WHEN w < 17 THEN 4 WHEN w < 21 THEN 5 WHEN w < 26 THEN 6
                    WHEN w < 30 THEN 7 WHEN w < 34 THEN 8 WHEN w < 39 THEN 9
                    WHEN w < 43 THEN 10 WHEN w < 47 THEN 11 ELSE 12 END AS p
        FROM wk
    )
    SELECT fyear, CAST((p - 1) // 3 + 1 AS BIGINT) AS quarter,
           CAST(p AS BIGINT) AS period,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM per GROUP BY fyear, p
    ORDER BY fyear, period
    """,
    doc="4-4-5 fiscal calendar rollup (the retail-standard reporting "
    "calendar: quarters of 4+4+5 weeks, fiscal year anchored Feb 1): "
    "pure integer date arithmetic maps every order date to (fiscal "
    "year, quarter, period) — week index = days-since-FY-start div 7 "
    "clamped into week 52 (the 53rd partial week folds into P12, the "
    "NRF convention), the period from the cumulative 4/8/13/17/... "
    "week fences. One scan + one keyed groupBy; the calendar logic is "
    "all codegen CASE arithmetic, no UDF, no calendar table to "
    "maintain.",
)
def dt_fiscal_calendar_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    fy = o.withColumn(
        "fyear",
        F.when(
            F.col("d") >= F.make_date(F.year("d"), F.lit(2), F.lit(1)),
            F.year("d"),
        ).otherwise(F.year("d") - 1),
    )
    wk = fy.select(
        "fyear",
        "cents",
        F.least(
            F.floor(
                F.datediff(
                    "d", F.make_date(F.col("fyear"), F.lit(2), F.lit(1))
                )
                / 7
            ),
            F.lit(51),
        )
        .cast("bigint")
        .alias("w"),
    )
    p = (
        F.when(F.col("w") < 4, 1)
        .when(F.col("w") < 8, 2)
        .when(F.col("w") < 13, 3)
        .when(F.col("w") < 17, 4)
        .when(F.col("w") < 21, 5)
        .when(F.col("w") < 26, 6)
        .when(F.col("w") < 30, 7)
        .when(F.col("w") < 34, 8)
        .when(F.col("w") < 39, 9)
        .when(F.col("w") < 43, 10)
        .when(F.col("w") < 47, 11)
        .otherwise(12)
    )
    return (
        wk.withColumn("p", p)
        .groupBy("fyear", "p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            "fyear",
            F.expr("(p - 1) div 3 + 1").cast("bigint").alias("quarter"),
            F.col("p").cast("bigint").alias("period"),
            "n_orders",
            "revenue_cents",
        )
        .orderBy("fyear", "period")
    )


@register(
    "stats_ratio_delta_method",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM per_user WHERE y > 0 OR x > 0
    )
    SELECT n, sx, sy,
           CAST(floor(1000000.0 * CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                AS BIGINT) AS ratio_q6,
           CAST(floor(1000000.0 * sqrt(greatest(
               ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                     / CAST(n AS DOUBLE))
                - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                      * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                             * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                             * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
               / (CAST(n AS DOUBLE)
                  * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 0.0)))
               AS BIGINT) AS se_q6
    FROM m
    """,
    doc="ratio-metric standard error by the DELTA METHOD (the "
    "experimentation-platform staple for 'revenue per click'-style "
    "metrics where the unit of analysis (user) differs from the "
    "denominator unit: naive binomial SEs are wrong; Deng et al. "
    "2017): user-grain exact BIGINT moments (sum/sumsq/cross of "
    "revenue cents and click counts), then "
    "Var(X/Y) ~ (Sxx - 2R*Sxy + R^2*Syy) / (n*ybar^2) in one "
    "identical double expression, floor-quantized (greatest(...,0) "
    "guards the degenerate all-constant case). One user-grain "
    "groupBy is the only data pass.",
)
def stats_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    m = per_user.filter((F.col("y") > 0) | (F.col("x") > 0)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")
    r = d("sx") / d("sy")
    var_num = (
        (d("sxx") - d("sx") * d("sx") / d("n"))
        - 2.0 * r * (d("sxy") - d("sx") * d("sy") / d("n"))
        + r * r * (d("syy") - d("sy") * d("sy") / d("n"))
    )
    se = F.sqrt(
        F.greatest(
            var_num / (d("n") * (d("sy") / d("n")) * (d("sy") / d("n"))),
            F.lit(0.0),
        )
    )
    return m.select(
        "n",
        "sx",
        "sy",
        F.floor(1000000.0 * r).cast("bigint").alias("ratio_q6"),
        F.floor(1000000.0 * se).cast("bigint").alias("se_q6"),
    )
