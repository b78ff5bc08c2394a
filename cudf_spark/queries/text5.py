"""Text pipeline, part 5 — corpus *transforms* (not just signals): C4-style
cross-document boilerplate span removal, within-document repeated-window
removal, and an interpolated bigram language-model scorer.

These are the mutation half of the repetition/quality family: text.py and
text3.py *measure* repetition and quality; these queries *rewrite* the
corpus — the step a real curation DAG runs between measuring and packing.
Public provenance: C4's repeated-span excision (Raffel et al. 2020,
arXiv:1910.10683 §2.2 removed any three-sentence span occurring more than
once in the corpus), within-document repetition trimming per Rae et al.
2021 (Gopher, arXiv:2112.11446 appendix A1), and the classic add-one
smoothed bigram LM (Jurafsky & Martin ch. 3 — public textbook material).

Reference scope: extends nvtext ngram/tokenize primitives
(cpp/src/text/generate_ngrams.cu — the reference stops at producing the
grams; removal/rescoring is pipeline logic it leaves to callers).

100 TB design notes, per query:
- boilerplate removal: gram->doc-count is ONE keyed groupBy (map-side
  partial agg); the boilerplate gram set joins back keyed on gram — NOT
  broadcast, because at corpus scale the offender set is itself large;
  position coverage explodes at most 5 rows per matched gram; document
  reassembly is one doc_id-keyed groupBy whose payload is bounded by
  document length. Nothing quadratic, nothing driver-side.
- within-doc dedup: the duplicate-window rank is a (doc_id, gram) window —
  partitions are documents, so skew is bounded by the longest document;
  every other stage is the same keyed-shuffle shape as above.
- bigram LM: bigram->count and history->count are keyed groupBys; the
  per-doc score join is keyed on the bigram string (the vocabulary is
  cluster-scale, so NO broadcast); only the 1-row vocab-size scalar
  broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cudf_spark.catalog import load
from cudf_spark.functions.textfns import normalize_text, tokenize
from cudf_spark.queries.registry import register
from cudf_spark.queries.similarity import _sql_cosine
from cudf_spark.queries.text import SQL_TOKS

BOILER_K = 5  # cross-doc boilerplate gram width
BOILER_MIN_DOCS = 3  # distinct-doc threshold to call a gram boilerplate
WITHIN_K = 3  # within-doc repeated-window width

# (doc_id, w) with empties dropped — the shared token-array CTE.
SQL_W = f"SELECT doc_id, list_filter({SQL_TOKS}, x -> x != '') AS w FROM documents"


def _tok_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, w: array<string>) — normalized tokens, empties dropped."""
    return docs.select(
        "doc_id",
        F.filter(tokenize(normalize_text(F.col("text"))), lambda t: t != "").alias("w"),
    )


def _grams_with_pos(t: DataFrame, k: int) -> DataFrame:
    """(doc_id, p, gram): every k-token window, 1-based start position.

    Guarded so documents shorter than k yield zero rows (Spark's
    ``sequence(1, 0)`` would otherwise DESCEND and fabricate windows —
    DuckDB's generate_series is empty there).
    """
    n = F.size("w")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice("w", i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc_id", F.posexplode(grams).alias("p0", "gram")).select(
        "doc_id", (F.col("p0") + 1).alias("p"), "gram"
    )


def _reassemble(t: DataFrame, cov: DataFrame) -> DataFrame:
    """Drop covered (doc_id, pos) tokens and rebuild each document.

    Output: (doc_id, n_tokens, n_removed, clean_text) for EVERY document —
    a fully-excised document survives with clean_text = ''.
    """
    toks = t.select("doc_id", F.posexplode("w").alias("p0", "tok")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "tok"
    )
    kept = toks.join(cov, ["doc_id", "pos"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    return (
        t.select("doc_id", F.size("w").alias("n_tokens"))
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def _sql_clean_stage(
    src: str, k: int, boiler: bool, out: str, min_docs: int = BOILER_MIN_DOCS
) -> str:
    """CTE fragment: excise k-gram windows from ``src(doc_id, w)`` —
    cross-doc boilerplate (>= ``min_docs`` docs) when ``boiler`` else
    within-doc repeats (keep-first) — emitting ``out(doc_id, n_tok,
    n_removed, clean_text)``. The ONE canonical excision SQL: the two
    standalone transform oracles and curation_pipeline_v2 all generate
    from here, mirroring _grams_with_pos + _reassemble stage-for-stage."""
    occ = f"""{out}_occ AS (
        SELECT doc_id, u.p AS p, u.gram AS gram
        FROM (SELECT doc_id,
                     unnest(list_transform(
                         generate_series(1, greatest(len(w) - {k - 1}, 0)),
                         i -> struct_pack(p := i,
                              gram := array_to_string(w[i:i+{k - 1}], ' ')))) AS u
              FROM {src}))"""
    if boiler:
        pick = f"""{out}_dup AS (
        SELECT o.doc_id, o.p FROM {out}_occ o
        JOIN (SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd FROM {out}_occ GROUP BY gram)
              WHERE nd >= {min_docs}) b USING (gram))"""
    else:
        pick = f"""{out}_dup AS (
        SELECT doc_id, p FROM (
            SELECT doc_id, p,
                   row_number() OVER (PARTITION BY doc_id, gram ORDER BY p) AS rn
            FROM {out}_occ)
        WHERE rn >= 2)"""
    return f"""{occ},
    {pick},
    {out}_cov AS (
        SELECT DISTINCT d.doc_id, d.p + s.off AS pos
        FROM {out}_dup d
        CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS off) s),
    {out}_kept AS (
        SELECT tk.doc_id, tk.pos, tk.tok
        FROM (SELECT doc_id, u.pos AS pos, u.tok AS tok
              FROM (SELECT doc_id,
                           unnest(list_transform(generate_series(1, len(w)),
                               i -> struct_pack(pos := i, tok := w[i]))) AS u
                    FROM {src})) tk
        ANTI JOIN {out}_cov c ON tk.doc_id = c.doc_id AND tk.pos = c.pos),
    {out} AS (
        SELECT t.doc_id, CAST(len(t.w) AS INT) AS n_tok,
               CAST(len(t.w) - coalesce(cl.n_kept, 0) AS INT) AS n_removed,
               coalesce(cl.clean_text, '') AS clean_text
        FROM {src} t LEFT JOIN (
            SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM {out}_kept GROUP BY doc_id) cl USING (doc_id))"""


@register(
    "text_remove_boilerplate",
    oracle=f"""
    WITH t AS ({SQL_W}),
    {_sql_clean_stage('t', BOILER_K, True, 's1')}
    SELECT doc_id, n_tok AS n_tokens, n_removed, clean_text
    FROM s1 ORDER BY doc_id
    """,
    doc="C4-style boilerplate excision (arXiv:1910.10683 §2.2): any "
    f"{BOILER_K}-token window appearing in >= {BOILER_MIN_DOCS} distinct "
    "documents is cut from every document containing it; documents are "
    "rebuilt from the surviving positions. Gram->doc-count is one keyed "
    "groupBy; the offender set joins back keyed on gram (no broadcast — "
    "at corpus scale it is large); reassembly is one doc_id-keyed groupBy "
    "bounded by document length.",
)
def text_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:

    t = _tok_arrays(load(spark, sf_dir, "documents"))
    # occ feeds the boilerplate-count groupBy AND the coverage join —
    # checkpoint so the corpus-wide tokenize+gram-explode runs once (no
    # cross-branch CSE in Catalyst; the text4 convention)
    occ = _grams_with_pos(t, BOILER_K).localCheckpoint(eager=False)
    boiler = (
        occ.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("gram")
    )
    cov = (
        occ.join(boiler, "gram")
        .select(
            "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + BOILER_K - 1)).alias("pos")
        )
        .distinct()
    )
    return _reassemble(t, cov)


@register(
    "text_dedup_within_doc",
    oracle=f"""
    WITH t AS ({SQL_W}),
    {_sql_clean_stage('t', WITHIN_K, False, 's1')}
    SELECT doc_id, n_tok AS n_tokens, n_removed, clean_text
    FROM s1 ORDER BY doc_id
    """,
    doc="Within-document repeated-window removal (Gopher repetition "
    f"trimming, arXiv:2112.11446 A1): every {WITHIN_K}-token window that "
    "already occurred earlier in the SAME document (keep-first by start "
    "position) is excised. The duplicate rank is a (doc_id, gram) window — "
    "partition skew is bounded by the longest document; the rest is the "
    "same keyed anti-join + doc_id-keyed reassembly as boilerplate "
    "removal.",
)
def text_dedup_within_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tok_arrays(load(spark, sf_dir, "documents"))
    occ = _grams_with_pos(t, WITHIN_K)
    w = Window.partitionBy("doc_id", "gram").orderBy("p")
    dup = (
        occ.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") >= 2)
        .select("doc_id", "p")
    )
    cov = dup.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + WITHIN_K - 1)).alias("pos")
    ).distinct()
    return _reassemble(t, cov)


@register(
    "fuzzy_token_pairs",
    oracle="""
    WITH v AS (
        SELECT t, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split(lower(p_name), ' ')) AS t FROM part)
        GROUP BY t),
    keys AS (
        SELECT t, n, unnest(list_concat([t],
            list_transform(generate_series(1, length(t)),
                i -> t[1:i-1] || t[i+1:length(t)]))) AS k
        FROM v),
    cand AS (
        SELECT DISTINCT a.t AS token_a, b.t AS token_b, a.n AS n_a, b.n AS n_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.t < b.t)
    SELECT token_a, token_b, n_a, n_b,
           CASE WHEN n_b > n_a OR (n_b = n_a AND token_b < token_a)
                THEN token_b ELSE token_a END AS canon
    FROM cand
    WHERE levenshtein(token_a, token_b) <= 1
    ORDER BY token_a, token_b
    """,
    doc="SymSpell-style fuzzy vocabulary matching (Garbe's symmetric-delete "
    "algorithm — public): candidate pairs share a single-character-deletion "
    "key (each token emits len+1 keys — itself + every 1-deletion), then "
    "levenshtein <= 1 verifies; canon points at the higher-frequency "
    "spelling (tie -> lexicographic). The deletion-key join replaces the "
    "quadratic all-pairs edit-distance scan with a keyed equi-join that "
    "grows linearly in vocabulary size — the 100 TB-safe shape for typo "
    "normalization over part/entity names.",
)
def fuzzy_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cudf_spark.operators.fuzzy import symspell_pairs

    part = load(spark, sf_dir, "part")
    v = (
        part.select(F.explode(F.split(F.lower(F.col("p_name")), " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return symspell_pairs(v).orderBy("token_a", "token_b")


@register(
    "text_bigram_loglik",
    oracle=f"""
    WITH t AS ({SQL_W}),
    bg AS (
        SELECT doc_id, u.w1 AS w1, u.b AS bigram
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                         i -> struct_pack(w1 := w[i], b := w[i] || ' ' || w[i+1]))) AS u
              FROM t)),
    c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    vocab AS (
        SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
        FROM (SELECT unnest(w) AS tok FROM t))
    -- SORTED fold, not avg(): the per-doc rows scatter across
    -- partitions after the two count joins, so an unordered double fold
    -- is engine- (and run-) order dependent; per-term ln stays the
    -- doc_temperature_mix-class libm residual, shielded by round(6)
    SELECT bg.doc_id,
           CAST(count(*) AS INT) AS n_bigrams,
           round(list_reduce(list_sort(list(ln((c2.c2 + 1) / (c1.c1 + vocab.v)))),
                             (x, y) -> x + y) / count(*), 6) AS mean_loglik,
           round(exp(-(list_reduce(list_sort(list(ln((c2.c2 + 1) / (c1.c1 + vocab.v)))),
                                   (x, y) -> x + y) / count(*))), 6) AS ppl
    FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1) CROSS JOIN vocab
    GROUP BY bg.doc_id ORDER BY bg.doc_id
    """,
    doc="Self-trained add-one-smoothed bigram LM score + perplexity "
    "(Jurafsky & Martin ch.3; the CCNet/KenLM-style quality signal one "
    "rung above text_unigram_loglik): p(y|x) = (c(xy)+1)/(c(x·)+V). "
    "Bigram and history counts are keyed groupBys; the score join is "
    "keyed on the bigram string (vocabulary is cluster-scale — no "
    "broadcast); only the 1-row V scalar broadcasts.",
)
def text_bigram_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tok_arrays(load(spark, sf_dir, "documents"))
    n = F.size("w")
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at("w", i).alias("w1"),
                F.concat_ws(
                    " ", F.element_at("w", i), F.element_at("w", i + 1)
                ).alias("bigram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,bigram:string>>"))
    bg = t.select("doc_id", F.explode(pairs).alias("u")).select(
        "doc_id", F.col("u.w1").alias("w1"), F.col("u.bigram").alias("bigram")
    )
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        t.select(F.explode("w").alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("v"))
    )
    ll = F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))
    # SORTED fold, not F.avg: per-doc rows scatter across partitions
    # after the count joins, so an unordered double fold is engine- and
    # run-order dependent (oracle mirrors with list_reduce(list_sort))
    sll = F.aggregate(
        F.array_sort(F.collect_list(ll)), F.lit(0.0), lambda a, x: a + x
    )
    mean = sll / F.count(F.lit(1))
    return (
        bg.join(c2, "bigram")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(mean, 6).alias("mean_loglik"),
            F.round(F.exp(-mean), 6).alias("ppl"),
        )
        .orderBy("doc_id")
    )


@register(
    "curation_pipeline_v2",
    oracle=f"""
    WITH base AS (
        SELECT d.doc_id, d.text, e.embedding
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    t0 AS (SELECT doc_id, list_filter({SQL_TOKS}, x -> x != '') AS w
           FROM base),
    {_sql_clean_stage('t0', 5, True, 's1')},
    t1 AS (SELECT doc_id,
                  list_filter(string_split(clean_text, ' '), x -> x != '') AS w
           FROM s1),
    {_sql_clean_stage('t1', 3, False, 's2')},
    digested AS (
        SELECT s1.doc_id, s1.n_tok AS n_tok0, s1.n_removed AS boiler_removed,
               s2.n_removed AS within_removed,
               CAST(s2.n_tok - s2.n_removed AS INT) AS n_tok_final,
               s2.clean_text,
               min(s2.doc_id) OVER (PARTITION BY md5(s2.clean_text)) AS keeper
        FROM s1 JOIN s2 USING (doc_id)),
    exact_kept AS (
        SELECT dg.*, b.embedding FROM digested dg JOIN base b USING (doc_id)
        WHERE dg.doc_id = dg.keeper),
    cents AS (
        SELECT doc_id AS cid, embedding AS cvec FROM exact_kept
        WHERE mod(doc_id, 53) = 11),
    assign AS (
        SELECT k.doc_id, k.n_tok0, k.boiler_removed, k.within_removed,
               k.n_tok_final, k.clean_text, k.embedding, c.cid,
               row_number() OVER (
                   PARTITION BY k.doc_id
                   ORDER BY {_sql_cosine('k.embedding', 'c.cvec')} DESC, c.cid
               ) AS rn
        FROM exact_kept k CROSS JOIN cents c),
    cells AS (SELECT * EXCLUDE (rn), cid AS cell FROM assign WHERE rn = 1),
    sem_dup AS (
        SELECT a.doc_id FROM cells a JOIN cells b
          ON a.cell = b.cell AND b.doc_id < a.doc_id
        WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= 0.40
        GROUP BY a.doc_id)
    SELECT c.doc_id, c.n_tok0, c.boiler_removed, c.within_removed,
           c.n_tok_final, CAST(c.cell AS BIGINT) AS cell,
           substr(md5(c.clean_text), 1, 16) AS text_hash
    FROM cells c ANTI JOIN sem_dup s ON c.doc_id = s.doc_id
    WHERE c.n_tok_final >= 10
    ORDER BY c.doc_id
    """,
    doc="End-to-end curation v2 — the round-4 operators composed into one "
    "DAG over the embedded sub-corpus: C4 boilerplate excision (5-gram, "
    ">=3 docs) -> within-doc repeated-window removal (3-gram keep-first) "
    "-> exact dedup on the CLEANED text (md5 keep-first) -> SemDeDup "
    "semantic dedup on embeddings (seeded centroids, cosine >= 0.40, "
    "keep-first) -> min-length quality gate. Every shuffle keyed (gram / "
    "doc_id / digest / cell); the oracle replays all five stages "
    "verbatim, and text_hash pins the exact surviving text byte-for-byte.",
)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:

    from cudf_spark.operators.similarity import semantic_dedup

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    base = d.join(e, d["doc_id"] == e["vec_id"]).select("doc_id", "text", "embedding")

    # S1: cross-doc boilerplate excision over the embedded sub-corpus
    # t0 feeds the gram explode AND the reassemble join (r10 nest audit)
    t0 = _tok_arrays(base).localCheckpoint(eager=False)
    # occ5 feeds the gram-count groupBy AND the coverage join — checkpoint
    # (the text_remove_boilerplate convention; tokenize+explode is the
    # corpus-scale cost here)
    occ5 = _grams_with_pos(t0, 5).localCheckpoint(eager=False)
    boiler = (
        occ5.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 3)
        .select("gram")
    )
    cov1 = (
        occ5.join(boiler, "gram")
        .select("doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + 4)).alias("pos"))
        .distinct()
    )
    s1 = _reassemble(t0, cov1).select(
        "doc_id",
        F.col("n_tokens").alias("n_tok0"),
        F.col("n_removed").alias("boiler_removed"),
        F.col("clean_text").alias("clean1"),
    ).localCheckpoint(eager=False)  # feeds S2's chain AND the staged join

    # S2: within-doc repeated-window removal on the cleaned text
    t1 = s1.select(
        "doc_id", F.filter(F.split("clean1", " "), lambda x: x != "").alias("w")
    )
    occ3 = _grams_with_pos(t1, 3)
    w3 = Window.partitionBy("doc_id", "gram").orderBy("p")
    dup3 = occ3.withColumn("rn", F.row_number().over(w3)).filter(F.col("rn") >= 2)
    cov2 = dup3.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + 2)).alias("pos")
    ).distinct()
    s2 = _reassemble(t1, cov2).select(
        "doc_id",
        F.col("n_removed").alias("within_removed"),
        (F.col("n_tokens") - F.col("n_removed")).cast("int").alias("n_tok_final"),
        F.col("clean_text").alias("clean2"),
    )

    # S3: exact dedup (keep lowest doc_id per md5 of the final text)
    staged = s1.join(s2, "doc_id")
    wdig = Window.partitionBy(F.md5("clean2"))
    exact_kept = (
        staged.withColumn("keeper", F.min("doc_id").over(wdig))
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("keeper")
        .join(base.select("doc_id", "embedding"), "doc_id")
        # three consumers (centroid seed, semantic_dedup input, survivor
        # join) — without this the whole S1+S2+S3 chain executes 3x
        .localCheckpoint(eager=False)
    )

    # S4: SemDeDup on the survivors' embeddings (keep-first within cells)
    cents = exact_kept.filter(F.col("doc_id") % 53 == 11).select(
        F.col("doc_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    sem = semantic_dedup(
        exact_kept.select("doc_id", "embedding"),
        cents,
        vec_col="embedding",
        id_col="doc_id",
        tau=0.40,
    )
    survivors = (
        exact_kept.join(sem, "doc_id")
        # degenerate seeded-centroid set (no keeper has doc_id % 53 ==
        # 11): ivf_assign yields cell = NULL for every row, while the
        # oracle's CROSS JOIN makes its assign CTE empty and returns 0
        # rows — dropping NULL cells replays that contract exactly (and
        # is a no-op whenever any centroid exists)
        .filter(F.col("cell").isNotNull())
        .filter(~F.col("is_dup"))
        # S5: minimum-length quality gate on the final text
        .filter(F.col("n_tok_final") >= 10)
    )
    return survivors.select(
        "doc_id",
        "n_tok0",
        "boiler_removed",
        "within_removed",
        "n_tok_final",
        F.col("cell").cast("bigint").alias("cell"),
        F.substring(F.md5("clean2"), 1, 16).alias("text_hash"),
    ).orderBy("doc_id")
