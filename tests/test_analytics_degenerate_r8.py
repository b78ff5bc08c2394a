"""Round-8 self-review regressions (analytics2/3/4 directory sweep):
degenerate inputs the parquet fixtures never produce, each of which
previously aborted under ANSI mode, split the engines, or merged
nondeterministically. Pinned via monkeypatched loads."""

from __future__ import annotations

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_interval_union_same_microsecond_twins(spark, monkeypatch):
    """Two same-µs events must land in ONE island deterministically —
    the island cumsum previously ordered by (st, en), which has no
    tiebreak (en = st + const), so the brk=0 twin could be absorbed
    into the PRIOR island depending on physical row order."""
    from cudf_spark.queries import analytics4 as mod

    ev = _events(
        spark,
        [
            (1, 7, "2024-01-01 00:00:00", "a"),
            # 10 minutes later (clear of the 5-min window): a new island
            # opened by two events sharing the exact same timestamp
            (2, 7, "2024-01-01 00:10:00", "a"),
            (3, 7, "2024-01-01 00:10:00", "a"),
        ],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    [r] = mod.events_interval_union_merge(spark, "unused").collect()
    assert r.n_merged == 2 and r.n_source == 3
    # island 1: 5 min; island 2: 5 min (twins fully overlap)
    assert r.busy_us == 2 * 300_000_000 and r.longest_us == 300_000_000


def test_curation_v4_whitespace_doc_flags_zero_not_null(spark, monkeypatch):
    """An all-whitespace doc produces no char-histogram rows; ent comes
    back NULL through the left join and ent_ok must be 0 (the oracle's
    CASE ELSE 0), never NULL."""
    from cudf_spark.queries import analytics2 as mod

    docs = spark.createDataFrame(
        [(1, "   \n\t  ", "en"), (2, "the and for are with data table", "en")],
        "doc_id long, text string, lang string",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: docs)
    rows = {r.doc_id: r for r in mod.curation_pipeline_v4(spark, "unused").collect()}
    assert rows[1].ent_ok == 0 and rows[1].keep == 0
    assert rows[1].ent_ok is not None and rows[1].keep is not None


def test_youden_and_pr_auc_degenerate_predictor_no_abort(spark, monkeypatch):
    """All-correct (zero negatives) and all-wrong (zero positives)
    corpora previously hit ANSI DIVIDE_BY_ZERO / floor(NaN) aborts."""
    from cudf_spark.queries import analytics4 as mod

    all_correct = spark.createDataFrame(
        [(1, "the and for are with", "en"), (2, "the of to in and", "en")],
        "doc_id long, text string, lang string",
    )
    all_wrong = spark.createDataFrame(
        [(1, "the and for are with", "zh"), (2, "the of to in and", "zh")],
        "doc_id long, text string, lang string",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: all_correct)
    [r] = mod.stats_youden_j_threshold(spark, "unused").collect()
    assert r.n_neg == 0 and r.j_q6 == 1_000_000  # TPR 1, FPR term 0
    rows = mod.ml_pr_auc(spark, "unused").collect()
    assert rows[0].pr_auc_q6 is not None

    monkeypatch.setattr(mod, "load", lambda s, d, n: all_wrong)
    [r] = mod.stats_youden_j_threshold(spark, "unused").collect()
    assert r.n_pos == 0 and r.j_q6 <= 0  # TPR term 0, -FPR
    [r] = mod.ml_pr_auc(spark, "unused").collect()
    assert r.n_pos == 0 and r.pr_auc_q6 is None  # undefined curve -> NULL


def test_linear_counting_saturated_bitmap_null_not_abort(spark, monkeypatch):
    """60k distinct users saturate the 4096-bit bitmap; log2(0) -> -inf
    previously aborted the BIGINT cast on both engines. The estimate is
    NULL past Whang's V > 0 validity bound."""
    from cudf_spark.queries import analytics4 as mod

    ev = spark.range(60_000).select(
        F.col("id").alias("event_id"), F.col("id").alias("user_id")
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    [r] = mod.agg_linear_counting(spark, "unused").collect()
    assert r.n_set == 4096
    assert r.lc_estimate is None and r.rel_err_q6 is None
    assert r.n_exact == 60_000


def test_kendall_tau_zero_variance_group_null(spark, monkeypatch):
    """A group with all-tied x zeroes the tie-corrected denominator:
    tau is undefined (NULL), not an Infinity -> BIGINT abort."""
    from cudf_spark.queries import analytics3 as mod

    li = spark.createDataFrame(
        # flag N: x varies but y is all-tied (same price band) -> the
        # cd row exists (x pairs) yet n0 - n2 = 0 -> tau NULL.
        # (All-tied x instead drops the group via the inner cd join on
        # BOTH engines — consistent, no guard needed there.)
        # flag R: proper variation -> tau defined
        [
            ("N", 1.0, 1000.0), ("N", 2.0, 1200.0), ("N", 3.0, 1400.0),
            ("R", 1.0, 1000.0), ("R", 2.0, 9000.0), ("R", 3.0, 22000.0),
        ],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    rows = {r.flag: r for r in mod.stats_kendall_tau_binned(spark, "unused").collect()}
    assert rows["N"].tau_b_q6 is None
    assert rows["R"].tau_b_q6 == 1_000_000  # perfectly concordant


def test_zipf_and_elasticity_single_point_null(spark, monkeypatch):
    """A single rank point / single price band has zero x-variance: the
    OLS slope is undefined -> NULL, never a NaN -> BIGINT abort."""
    from cudf_spark.queries import analytics4 as mod

    one_word = spark.createDataFrame(
        [(1, "spark spark spark", "en")], "doc_id long, text string, lang string"
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: one_word)
    [r] = mod.text_zipf_fit(spark, "unused").collect()
    assert r.n == 1 and r.slope_q6 is None and r.intercept_q6 is None

    one_band = spark.createDataFrame(
        [(1.0, 100.0), (2.0, 200.0)], "l_quantity double, l_extendedprice double"
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: one_band)
    [r] = mod.events_price_elasticity(spark, "unused").collect()
    assert r.n == 1 and r.elasticity_q6 is None


def test_assortativity_regular_graph_null(spark, monkeypatch):
    """A 2-regular graph (triangle) has zero degree variance: r is
    undefined -> NULL instead of an Infinity -> BIGINT abort."""
    from cudf_spark.queries import analytics3 as mod

    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], "l_orderkey long, l_partkey long"
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    [r] = mod.graph_assortativity(spark, "unused").collect()
    assert r.m == 6 and r.n_nodes == 3  # symmetrized triangle
    assert r.assortativity_q6 is None


def test_ljung_box_zero_variance_series_null(spark, monkeypatch):
    """One event per day for 10 days: every deviation is 0, den = 0 —
    rho and Q are undefined (NULL) instead of a floor(Infinity) abort
    (re-review catch: the round's first fix ordered the fold but left
    the denominator unguarded)."""
    from cudf_spark.queries import analytics4 as mod

    ev = _events(
        spark,
        [(i, 1, f"2024-01-{i + 1:02d} 12:00:00", "a") for i in range(10)],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: ev)
    [r] = mod.stats_ljung_box(spark, "unused").collect()
    assert r.n_days == 10 and r.n_lags == 5 and r.q_stat is None


def test_neyman_all_zero_variance_null(spark, monkeypatch):
    """One doc per source: every stratum weight is 0, tw = 0 — quota
    and alloc are NULL on both engines instead of floor(NaN) aborting
    Spark (re-review catch, same partial-guard class)."""
    import duckdb
    import pandas as pd

    from cudf_spark.queries import REGISTRY
    from cudf_spark.queries import analytics3 as mod

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "source": ["s1", "s2"], "n_chars": [100, 200]}
    )
    docs = spark.createDataFrame(pdf)
    monkeypatch.setattr(mod, "load", lambda s, d, n: docs)
    rows = mod.doc_neyman_allocation(spark, "unused").collect()
    assert [(r.source, r.n_docs, r.quota_q6, r.alloc) for r in rows] == [
        ("s1", 1, None, None),
        ("s2", 1, None, None),
    ]
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(REGISTRY["doc_neyman_allocation"].oracle).fetchall()
    assert oracle == [("s1", 1, None, None), ("s2", 1, None, None)]


def test_median_of_means_and_bootstrap_empty_input(spark, monkeypatch):
    """Empty lineitem: k/nb = 0 made element_at(ms, 0) throw
    INVALID_INDEX_OF_ZERO (Spark array indices start at 1) while the
    oracle returned a NULL-median row (analytics.py directory sweep)."""
    from cudf_spark.queries import analytics as mod

    empty = spark.createDataFrame(
        [],
        "l_orderkey long, l_linenumber long, l_partkey long,"
        " l_quantity double, l_extendedprice double",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: empty)
    [r] = mod.agg_median_of_means(spark, "unused").collect()
    assert r.k == 0 and r.mom_dollars_q6 is None
    [r] = mod.stats_bootstrap_ci_poisson(spark, "unused").collect()
    assert r.n_replicates == 0 and r.ci_lo is None and r.ci_hi is None


def test_gopher_whitespace_doc_null_ratios(spark, monkeypatch):
    """A whitespace-only doc normalizes to zero tokens; the ratio
    divisions previously aborted under Spark 4 ANSI (which errors even
    on DOUBLE division by zero — probed) while the oracle returned NULL
    ratios. (pipeline/similarity/streaming directory sweep)"""
    from cudf_spark.queries import pipeline as mod

    docs = spark.createDataFrame(
        [(1, "   \t  ", "en"), (2, "the gopher rules apply to this doc", "en")],
        "doc_id long, text string, lang string",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: docs)
    rows = {r.doc_id: r for r in mod.text_quality_gopher(spark, "unused").collect()}
    assert rows[1].n_words == 0
    assert rows[1].mean_word_len is None and rows[1].top_word_frac is None
    assert rows[1].gopher_pass is False  # word-count bound already fails


def test_chunk_overlap_empty_doc_dropped(spark, monkeypatch):
    """An empty-text doc made Spark's sequence(1, 0, 384) raise 'Illegal
    sequence boundaries' while DuckDB's generate_series yielded [] and
    dropped the row — the pre-filter reproduces the oracle's drop."""
    from cudf_spark.queries import pipeline as mod

    docs = spark.createDataFrame(
        [(1, ""), (2, "x" * 500)], "doc_id long, text string"
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: docs)
    rows = mod.doc_chunk_overlap(spark, "unused").collect()
    assert {r.doc_id for r in rows} == {2}
    assert len(rows) == 2  # starts 1 and 385


def test_quality_score_whitespace_doc_null_ratios(spark, monkeypatch):
    """text_quality_score: a zero-token doc previously aborted the
    /n_tok divisions under ANSI while the oracle's x/0 is NULL in
    DuckDB; a NULL text must flow NULL through every column. Expected
    values pinned from a live DuckDB run of the registered oracle.
    (text/text2/relational directory sweep)"""
    from cudf_spark.queries import text as mod

    docs = spark.createDataFrame(
        [(1, "   \t  "), (2, "ab"), (3, "the cat sat on the mat"), (4, None)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: docs)
    rows = {r.doc_id: r for r in mod.text_quality_score(spark, "unused").collect()}
    assert rows[1].n_tok == 0
    assert rows[1].avg_tok_len is None and rows[1].stop_ratio is None
    assert rows[1].quality_q4 is None
    assert (rows[2].n_tok, rows[2].avg_tok_len, rows[2].stop_ratio,
            rows[2].quality_q4) == (1, 2.0, 0.0, 600)
    assert (rows[3].n_tok, rows[3].quality_q4) == (6, 1808)
    assert rows[4].n_tok is None and rows[4].quality_q4 is None


def test_char_ngrams_short_doc_null_not_fabricated(spark, monkeypatch):
    """text_char_ngrams: a doc whose normalized text is shorter than 3
    chars made Spark's sequence(1, length-2) DESCEND and fabricate
    grams; DuckDB's generate_series is empty there and its
    array_to_string([], '|') is NULL (probed) — the guard must produce
    NULL char3, never '' or junk. (text/text2/relational sweep)"""
    from cudf_spark.queries import text as mod

    docs = spark.createDataFrame(
        [(1, "  "), (2, "ab"), (3, "the cat sat on the mat"), (4, None)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: docs)
    rows = {r.doc_id: r for r in mod.text_char_ngrams(spark, "unused").collect()}
    assert rows[1].char3 is None and rows[1].n_chars == 0
    assert rows[2].char3 is None and rows[2].n_chars == 2
    assert rows[3].char3.startswith("the|he |e c|") and rows[3].n_chars == 20
    assert rows[4].char3 is None and rows[4].n_chars is None
