"""Targeted tests for analytics4: k-anonymity risk counting, Hill tail
index vs numpy, and DiD vs hand-computed cell means."""

from __future__ import annotations

import math

import pandas as pd
import pytest


def _events(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_k_anonymity_flags_small_groups(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-12-01")
    rows = []
    eid = 0
    # group A: 10 rows, 5 users (safe); group B: 2 rows 1 user (k and l risk)
    for i in range(10):
        rows.append((eid, base, i % 5, "t", 10.0, "{}")); eid += 1
    for i in range(2):
        rows.append((eid, base + pd.Timedelta(days=1), 77, "t", 10.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.dq_k_anonymity(spark, "u").collect()[0]
    assert r.n_groups == 2 and r.n_rows == 12
    assert r.min_k == 2
    assert r.rows_at_k_risk == 2  # only group B's rows
    assert r.groups_low_l == 1   # group B has 1 distinct user


def test_hill_tail_index_pareto_recovery(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(97)
    base = pd.Timestamp("2024-12-01")
    # user activity ~ Pareto(alpha=2): counts = ceil(x)
    alpha = 2.0
    counts = np.ceil((1.0 / rng.uniform(size=400)) ** (1 / alpha) * 5).astype(int)
    rows = []
    eid = 0
    for uid, c in enumerate(counts):
        for _ in range(min(int(c), 500)):
            rows.append((eid, base + pd.Timedelta(seconds=eid), uid, "t", 1.0, "{}"))
            eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_hill_tail_index(spark, "u").collect()[0]

    # replicate exactly: top-k order stats with user tiebreak
    per = pdf.groupby("user_id").size().reset_index(name="c")
    per = per.sort_values(["c", "user_id"], ascending=[False, True])
    n = len(per)
    k = min(100, n // 2)
    vals = per["c"].tolist()
    xm = vals[k - 1]
    s9 = sum(math.floor(1e9 * math.log2(v / xm) * mod._LN2) for v in vals[: k - 1])
    assert (r.k, r.n_users, r.x_min) == (k, n, xm)
    assert r.sum_ln_n9 == s9
    assert r.alpha_q6 == (k - 1) * 1_000_000_000_000_000 // s9
    # Hill recovers the generating exponent within estimator noise
    assert 1_300_000 < r.alpha_q6 < 3_000_000


def test_did_matches_cell_means(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(101)
    base = pd.Timestamp("2024-12-01")
    rows = []
    eid = 0
    # construct a known +200-cent treatment effect in the post period
    for uid in range(40):
        treated = uid % 2
        for d in (5, 20):  # one pre day, one post day
            post = d >= 16
            mu = 10.0 + 2.0 * (treated and post)
            for _ in range(5):
                v = float(mu + rng.normal(0, 0.5))
                rows.append((eid, base.replace(day=d) + pd.Timedelta(minutes=eid % 300),
                             uid, "t", v, "{}"))
                eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.events_did_estimator(spark, "u").collect()[0]

    cents = (pdf["value"] * 100).round().astype(int)
    treated = (pdf["user_id"] % 2).astype(int)
    post = (pdf["ts"].dt.day >= 16).astype(int)
    means = {}
    var_terms = 0.0
    for t in (0, 1):
        for p in (0, 1):
            sel = cents[(treated == t) & (post == p)]
            means[(t, p)] = sel.mean()
            var_terms += sel.to_numpy(dtype=float).var() / len(sel)
    did = means[(1, 1)] - means[(1, 0)] - means[(0, 1)] + means[(0, 0)]
    assert r.n_events == len(pdf)
    assert r.did_cents == math.floor(did)
    assert r.se_cents_q6 == pytest.approx(1e6 * math.sqrt(var_terms), abs=2)
    assert 150 <= r.did_cents <= 250  # recovers the +200c effect


def test_pinball_loss_asymmetry_and_split(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0
    # 20 days: train days 0..10 have counts 1..11 -> p90 = 10
    # test days 11..19 alternate above/below
    counts = list(range(1, 12)) + [12, 8, 12, 8, 12, 8, 12, 8, 12]
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid), 1,
                         "t", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.ts_pinball_loss_eval(spark, "u").collect()[0]

    # cut = day0 + (19-0)//2 = day 9 -> train = days 0..9 (counts 1..10)
    # p90 of 1..10 by 10*cum >= 9*n -> 9
    assert r.pred_p90 == 9
    test = counts[10:]
    pin = sum(9 * (c - 9) if c >= 9 else (9 - c) for c in test)
    assert r.n_test_days == len(test)
    assert r.pinball_x10 == pin
    assert r.n_exceed == sum(1 for c in test if c > 9)


def test_stupid_backoff_exact_scores(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    docs = ["a b c", "a b d", "x y"]
    pdf = pd.DataFrame({
        "doc_id": range(3), "text": docs, "lang": ["en"] * 3,
        "source": ["s"] * 3, "n_chars": [5, 5, 3]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.doc_id: (r.n_bigrams, r.score_sum_q6)
           for r in mod.text_stupid_backoff_score(spark, "u").collect()}

    # counts: a:2 b:2 c:1 d:1 x:1 y:1, N=8
    # bigrams: (a,b):2 (b,c):1 (b,d):1 (x,y):1
    # doc0: s(a,b)=2e6//2=1e6 ; s(b,c)=1e6//2=5e5 -> sum 1.5e6
    assert got[0] == (2, 1_500_000)
    assert got[1] == (2, 1_500_000)
    # doc2: (x,y) seen once: 1e6//1 = 1e6
    assert got[2] == (1, 1_000_000)


def test_sprt_crossing_detects_imbalance(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-05-01")
    rows = []
    eid = 0
    # heavy treatment imbalance (60/40) -> LLR drifts up, crosses ln(19)
    for d in range(15):
        for _ in range(60):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                         1, "t", 1.0, "{}")); eid += 1  # odd uid -> treated
        for _ in range(40):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                         2, "t", 1.0, "{}")); eid += 1  # even uid -> control
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_sprt_crossing(spark, "u").collect()[0]

    # replicate the integer walk
    llr = 0
    first = None
    for d in range(15):
        llr += 60 * mod._SPRT_W1 + 40 * mod._SPRT_W0
        if first is None and (llr >= mod._SPRT_A or llr <= -mod._SPRT_A):
            first = d
    assert r.decision == 1
    assert r.first_crossing_day == str((base + pd.Timedelta(days=first)).date())
    assert r.max_llr_n9 == 15 * (60 * mod._SPRT_W1 + 40 * mod._SPRT_W0)
    # balanced data must NOT cross
    rows2 = []
    eid = 0
    for d in range(15):
        for u in (1, 2):
            for _ in range(50):
                rows2.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                              u, "t", 1.0, "{}")); eid += 1
    monkeypatch.setattr(mod, "load",
                        lambda s, d, n: spark.createDataFrame(_events(rows2)))
    r2 = mod.stats_sprt_crossing(spark, "u").collect()[0]
    # balanced data drifts DOWN (E[increment] < 0 under p=0.5) and hits
    # the LOWER boundary: SPRT accepts H0 — decision -1, not "no decision"
    assert r2.decision == -1
    assert r2.max_llr_n9 < 0


def test_linear_counting_accuracy(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-06-01")
    # 300 distinct users, bitmap 4096 bits -> sparse regime, small error
    rows = [(i, base + pd.Timedelta(seconds=i), i % 300, "t", 1.0, "{}")
            for i in range(900)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.agg_linear_counting(spark, "u").collect()[0]

    import hashlib
    bits = {int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % mod._LC_M
            for u in range(300)}
    assert r.n_exact == 300
    assert r.n_set == len(bits)
    est = math.floor(-mod._LC_M * math.log2((mod._LC_M - len(bits)) / mod._LC_M)
                     * 0.6931471805599453)
    assert r.lc_estimate == est
    assert abs(est - 300) / 300 < 0.1  # sparse regime: within 10%


def test_capture_recapture_chapman(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-06-01")
    # 200 users, several events each -> samples see most users
    rows = []
    eid = 0
    for u in range(200):
        for _ in range(6):
            rows.append((eid, base + pd.Timedelta(seconds=eid), u, "t", 1.0, "{}"))
            eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_capture_recapture(spark, "u").collect()[0]

    assert r.n_true == 200
    assert r.chapman_estimate == ((r.n1 + 1) * (r.n2 + 1)) // (r.overlap + 1) - 1
    # half-probability sampling of 6 events/user sees ~98% of users
    assert abs(r.chapman_estimate - 200) <= 20


def test_join_cardinality_estimate_exact_keys(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(103)
    # part: keys 0..49 once each; lineitem: each key repeated uniformly
    part = pd.DataFrame({"p_partkey": range(50), "p_name": ["p"] * 50,
                         "p_brand": ["b"] * 50, "p_type": ["t"] * 50,
                         "p_size": [1] * 50, "p_retailprice": [1.0] * 50})
    li_keys = rng.randint(0, 50, 600)
    li = pd.DataFrame({
        "l_orderkey": range(600), "l_partkey": li_keys,
        "l_suppkey": [1] * 600, "l_linenumber": range(600),
        "l_quantity": [1.0] * 600, "l_extendedprice": [1.0] * 600,
        "l_discount": [0.0] * 600, "l_tax": [0.0] * 600,
        "l_returnflag": ["N"] * 600, "l_linestatus": ["O"] * 600,
        "l_shipdate": [pd.Timestamp("2024-01-01")] * 600})
    tables = {"part": part, "lineitem": li}
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(tables[n]))
    r = mod.misc_join_cardinality_estimate(spark, "u").collect()[0]

    assert r.actual_rows == 600  # every lineitem key exists in part
    # rel_err is defined from the same integers the query reports
    assert r.rel_err_q6 == abs(r.est_rows - 600) * 1_000_000 // 600
    assert r.rel_err_q6 < 100_000  # within 10% on uniform data


def test_interval_union_merge_nested_and_chained(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-07-01")
    # user 1: events at t=0s, 60s (overlap), 400s (chained via overlap w/
    # the 60s window? 60+300=360 < 400 -> NEW island), so islands:
    # [0, 360] (2 src) and [400, 700] (1 src)
    # user 2: nested case — events at 0s and 10s; both inside one island
    rows = [
        (0, base, 1, "t", 1.0, "{}"),
        (1, base + pd.Timedelta(seconds=60), 1, "t", 1.0, "{}"),
        (2, base + pd.Timedelta(seconds=400), 1, "t", 1.0, "{}"),
        (3, base, 2, "t", 1.0, "{}"),
        (4, base + pd.Timedelta(seconds=10), 2, "t", 1.0, "{}"),
    ]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.user_id: r for r in mod.events_interval_union_merge(spark, "u").collect()}

    r1 = out[1]
    assert (r1.n_merged, r1.n_source) == (2, 3)
    assert r1.busy_us == (360 + 300) * 1_000_000
    assert r1.longest_us == 360 * 1_000_000
    r2 = out[2]
    assert (r2.n_merged, r2.n_source) == (1, 2)
    assert r2.busy_us == 310 * 1_000_000


def test_odds_ratio_mh_known_effect(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(107)
    base = pd.Timestamp("2024-07-01")
    rows = []
    eid = 0
    # exposed users (odd) get the high value with prob 0.6, control 0.2
    # -> OR = (0.6/0.4)/(0.2/0.8) = 6; the 0.4 overall high-rate keeps
    # the global median at the LOW value so outcome isn't degenerate
    for d in range(14):
        for uid in range(1, 41):
            exposed = uid % 2
            p = 0.6 if exposed else 0.2
            v = 20.0 if rng.uniform() < p else 2.0
            rows.append((eid, base + pd.Timedelta(days=d, minutes=eid % 600),
                         uid, "t", v, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_odds_ratio_mh(spark, "u").collect()[0]

    assert r.n_strata == 7
    assert r.or_mh_q6 == r.num_n9 * 1_000_000 // r.den_n9
    # pooled OR near the generating 5.44, well away from 1
    assert 3_500_000 < r.or_mh_q6 < 10_000_000


def test_vad_segments_matches_pure_python(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    pdf = pd.DataFrame({
        "doc_id": [3, 7, 11], "text": ["t"] * 3, "lang": ["en"] * 3,
        "source": ["s"] * 3, "n_chars": [123, 456, 77]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.asset_id: r for r in mod.mm_audio_vad_segments(spark, "u").collect()}

    for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
        n = nc % 500 + 50
        base = did % 4096
        samples = [((base + 13 * k) % 4096) - 2048 for k in range(n)]
        nf = n // 10
        acts = []
        for f in range(nf):
            e = sum(s * s for s in samples[f * 10:(f + 1) * 10])
            acts.append(1 if e > mod._VAD_THRESH else 0)
        segs = []
        cur = 0
        for a in acts:
            if a:
                cur += 1
            elif cur:
                segs.append(cur)
                cur = 0
        if cur:
            segs.append(cur)
        r = got[did]
        assert r.n_frames == nf
        assert r.n_active == sum(acts)
        assert r.n_segments == len(segs)
        assert r.longest_frames == (max(segs) if segs else 0)


def test_bitemporal_asof_late_knowledge(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-01-01")
    # user 1: value set to 5.0 on Jan 9 (event_id 0 -> no ingest delay),
    # corrected to 7.0 on Jan 10 09:00 BUT with event_id 6 -> 30-min
    # delay; both visible at the Jan-10 probe (ptx = pv + 10 min only
    # matters for versions landing minutes before midnight)
    rows = [
        (0, base + pd.Timedelta(days=8), 1, "t", 5.0, "{}"),
        (6, base + pd.Timedelta(days=9, hours=9), 1, "t", 7.0, "{}"),
        # user 2: a value at Jan 10 23:55 with event_id 13 -> 13%7=6 ->
        # 30-min delay: tx_from Jan 11 00:25 > ptx Jan 11 00:09:59 ->
        # INVISIBLE at probe 1, visible at probe 2
        (13, base + pd.Timedelta(days=9, hours=23, minutes=55), 2, "t", 9.0, "{}"),
    ]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {(r.user_id, r.probe_id): (r.ans_event_id, r.ans_cents)
           for r in mod.join_bitemporal_asof(spark, "u").collect()}

    assert got[(1, 1)] == (6, 700)   # correction already known
    assert got[(1, 2)] == (6, 700)
    assert got[(2, 1)] == (None, None)  # late-arriving version invisible
    assert got[(2, 2)] == (13, 900)     # visible once tx caught up
    assert len(got) == 6  # 2 users x 3 probes, spine complete


def test_dup_coverage_ratio_known_overlap(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    shared = "the quick brown fox jumps over the lazy dog again"
    docs = [
        shared + " alpha unique tail one",
        shared + " beta unique tail two xx",
        "totally unique document text with no duplicate twenty-gram runs",
    ]
    pdf = pd.DataFrame({
        "doc_id": range(3), "text": docs, "lang": ["en"] * 3,
        "source": ["s"] * 3, "n_chars": [len(t) for t in docs]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.doc_id: r for r in mod.dedup_dup_coverage_ratio(spark, "u").collect()}

    # the shared prefix PLUS the following space both docs share is one
    # maximal dup span (every 20-gram inside it repeats across the docs)
    common = len(shared) + 1
    for did in (0, 1):
        r = got[did]
        assert r.n_spans == 1
        assert r.dup_chars == common
        assert r.coverage_pm == common * 1000 // len(docs[did])
    assert got[2].dup_chars == 0 and got[2].coverage_pm == 0


def test_stochastic_oscillator_matches_pandas(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(109)
    base = pd.Timestamp("2024-08-01")
    rows = [(i, base + pd.Timedelta(minutes=i), i % 3, "t",
             float(rng.randint(100, 999)) / 100.0, "{}") for i in range(300)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {(r.user_id, r.event_id): (r.k_q6, r.d_q6)
           for r in mod.win_stochastic_oscillator(spark, "u").collect()}

    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cs = (g["value"] * 100).round().astype(int).tolist()
        eids = g["event_id"].tolist()
        ks = []
        for i, c in enumerate(cs):
            fr = cs[max(0, i - 13): i + 1]
            lo, hi = min(fr), max(fr)
            k = (c - lo) * 1_000_000 // (hi - lo) if hi > lo else None
            ks.append(k)
            dwin = ks[max(0, i - 2): i + 1]
            d = (sum(dwin) // 3 if len(dwin) == 3 and all(x is not None for x in dwin)
                 else None)
            assert got[(uid, eids[i])] == (k, d)


def test_rich_club_two_cliques(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # hub clique 0..4 all co-ordered repeatedly; leaves 10..29 hang off
    rows = []
    ln = 0
    o = 0
    for _ in range(10):
        for p in range(5):
            ln += 1
            rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         pd.Timestamp("2024-01-01")))
        o += 1
    for leaf in range(10, 30):
        ln += 1
        rows.append((o, leaf, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     pd.Timestamp("2024-01-01")))
        ln += 1
        rows.append((o, leaf % 5, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     pd.Timestamp("2024-01-01")))
        o += 1
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.pct: r for r in mod.graph_rich_club_coefficient(spark, "u").collect()}

    # p50 threshold (k=1) isolates the 5 hubs (degree 8) above the
    # leaves (degree 1); the hub clique is complete -> phi = 1
    r50 = out[50]
    assert r50.n_rich == 5
    assert r50.e_rich == 10  # C(5,2)
    assert r50.phi_q6 == 1_000_000
    # p90 lands ON the hub degree (k=8): the club above it is empty but
    # the row must still surface with zeros (the silently-empty lesson)
    r90 = out[90]
    assert (r90.k, r90.n_rich, r90.e_rich) == (8, 0, 0)
    assert r90.phi_q6 is None


def test_haar_energy_parseval_and_seasonality(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-03-01")
    # period-2 alternation concentrates energy in level 1
    rows = []
    eid = 0
    counts = [20 if d % 2 == 0 else 4 for d in range(30)]
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 86000),
                         1, "t", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows_out = mod.events_haar_wavelet_energy(spark, "u").collect()

    padded = counts + [0, 0]
    level = padded
    energies = []
    for _ in range(5):
        nxt, ws = [], []
        for i in range(0, len(level), 2):
            nxt.append(level[i] + level[i + 1])
            ws.append(level[i] - level[i + 1])
        energies.append(sum(w * w for w in ws))
        level = nxt
    for r, e in zip(rows_out, energies):
        assert r.energy == e
    # the alternating signal puts the dominant share in level 1
    assert rows_out[0].share_q6 > max(r.share_q6 for r in rows_out[1:])


def test_zipf_fit_recovers_slope(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # construct an exact Zipf corpus: word w_r appears floor(1000/r) times
    words = []
    for r in range(1, 40):
        words.extend([f"w{r:02d}"] * (1000 // r))
    text = " ".join(words)
    pdf = pd.DataFrame({"doc_id": [0], "text": [text], "lang": ["en"],
                        "source": ["s"], "n_chars": [len(text)]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.text_zipf_fit(spark, "u").collect()[0]
    assert r.n == 39
    # slope of log2(1000/r) vs log2(r) is ~ -1
    assert -1_100_000 < r.slope_q6 < -900_000
    # intercept ~ log2(1000) ~ 9.97 in q6
    assert 9_500_000 < r.intercept_q6 < 10_500_000


def test_youden_j_exact_sweep(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # engineered docs: high-confidence docs are correct, low are wrong
    docs = [
        ("the and of with for", "en"),    # all-en markers: conf 1.0, correct
        ("the and of with for", "en"),
        ("el la es und the", "es"),       # mixed: mid conf
        ("xyz", "de"),                    # no evidence: conf 0.2, wrong
        ("xyz", "fr"),
    ]
    pdf = pd.DataFrame({
        "doc_id": range(len(docs)), "text": [t for t, _ in docs],
        "lang": [l for _, l in docs], "source": ["s"] * len(docs),
        "n_chars": [len(t) for t, _ in docs]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_youden_j_threshold(spark, "u").collect()[0]

    assert r.n_pos + r.n_neg == 5
    # J identity and bounds
    assert r.j_q6 == r.tp * 1_000_000 // r.n_pos - r.fp * 1_000_000 // r.n_neg
    assert 0 <= r.j_q6 <= 1_000_000
    # the chosen threshold must separate at least one correct from wrongs
    assert r.tp >= 1


def test_er_cluster_transitive_chain(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # chain: "small ring" ~ "smal ring" ~ "smal rink" (transitively one
    # entity even though ends differ by >3? small ring vs smal rink = 2)
    names = ["small ring", "smal ring", "smal rink", "blue bolt", "blew bolt",
             "green gear"]
    pdf = pd.DataFrame({
        "p_partkey": range(len(names)), "p_name": names,
        "p_brand": ["b"] * len(names), "p_type": ["t"] * len(names),
        "p_size": [1] * len(names), "p_retailprice": [1.0] * len(names)})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.entity: (r.n_names, r.members)
           for r in mod.er_cluster_entities(spark, "u").collect()}

    assert got["smal ring"] == (3, "smal ring|smal rink|small ring")
    assert got["blew bolt"] == (2, "blew bolt|blue bolt")
    assert "green gear" not in got  # singleton: no edges, not clustered


def test_association_rules_exact_lift(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # 10 orders: {1,2} together in 6, {1,3} in 2, singles pad support
    rows = []
    ln = 0
    o = 0
    for _ in range(6):
        for p in (1, 2):
            ln += 1; rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                                  pd.Timestamp("2024-01-01")))
        o += 1
    for _ in range(2):
        for p in (1, 3):
            ln += 1; rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                                  pd.Timestamp("2024-01-01")))
        o += 1
    for p in (2, 3):
        ln += 1; rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                              pd.Timestamp("2024-01-01")))
        o += 1
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {(r.ante, r.cons): (r.n_both, r.conf_q6, r.lift_q6)
           for r in mod.mining_association_rules(spark, "u").collect()}

    n_orders = 10
    supp = {1: 8, 2: 7, 3: 3}
    for (a, b), c in {(1, 2): 6, (1, 3): 2}.items():
        for x, y in ((a, b), (b, a)):
            conf = c * 1_000_000 // supp[x]
            lift = c * n_orders * 1_000_000 // (supp[x] * supp[y])
            assert got[(x, y)] == (c, conf, lift)
    # lift symmetric, confidence not
    assert got[(1, 2)][2] == got[(2, 1)][2]
    assert got[(1, 2)][1] != got[(2, 1)][1]


def test_friedman_detects_weekday_effect(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-01-01")  # Jan 2024: day 1 is a Monday
    rows = []
    eid = 0
    # strong weekday effect: volume = 10 + 5*dow_index, constant across weeks
    for d in range(28):
        n = 10 + 5 * (d % 7)
        for _ in range(n):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                         1, "t", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_friedman_test(spark, "u").collect()[0]

    assert (r.n_blocks, r.k) == (4, 7)
    # identical rankings every block -> maximal Friedman statistic
    # Q_max = n*(k-1) = 4*6 = 24
    assert r.q_q6 == 24_000_000
    # and a flat signal must score ~0
    rows2 = []
    eid = 0
    for d in range(28):
        for _ in range(10):
            rows2.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                          1, "t", 1.0, "{}")); eid += 1
    monkeypatch.setattr(mod, "load",
                        lambda s, d, n: spark.createDataFrame(_events(rows2)))
    r2 = mod.stats_friedman_test(spark, "u").collect()[0]
    assert r2.q_q6 == 0  # all ties -> midranks equal -> Q = 0


def test_io_roundtrips_detect_corruption(spark, monkeypatch, tmp_path):
    """The roundtrip queries must reproduce the source aggregate exactly
    on a fixture we control (and the avro writer/reader pair must not
    lose a partition)."""
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-02-01")
    rows = [(i, base + pd.Timedelta(minutes=i), i % 4, ["a", "b"][i % 2],
             float(i) / 4.0, "{}") for i in range(200)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))

    exp = {}
    cents = (pdf["value"] * 100).round().astype(int)
    for t, g in pdf.groupby("event_type"):
        exp[t] = (len(g), int(cents[g.index].sum()), int(g["event_id"].sum()))

    for r in mod.io_avro_roundtrip_agg(spark, "u").collect():
        assert exp[r.event_type] == (r.n, r.sum_cents, r.sum_eid)
    seen = set()
    for r in mod.io_multiformat_roundtrip(spark, "u").collect():
        assert exp[r.event_type] == (r.n, r.sum_cents, r.sum_eid)
        seen.add(r.fmt)
    assert seen == {"csv", "json", "orc"}


def test_codec_and_partition_roundtrips(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-02-01")
    rows = [(i, base + pd.Timedelta(minutes=i), i % 4,
             ["click", "purchase", "view"][i % 3], float(i) / 4.0, "{}")
            for i in range(120)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))

    cents = (pdf["value"] * 100).round().astype(int)
    by_type = {}
    for t, g in pdf.groupby("event_type"):
        by_type[t] = (len(g), int(cents[g.index].sum()), int(g["event_id"].sum()))

    codecs = set()
    for r in mod.io_parquet_codec_roundtrip(spark, "u").collect():
        assert by_type[r.event_type] == (r.n, r.sum_cents, r.sum_eid)
        codecs.add(r.codec)
    assert codecs == {"gzip", "snappy", "zstd"}

    got = {r.event_type: (r.n, r.sum_cents)
           for r in mod.io_partitioned_write_pruning(spark, "u").collect()}
    assert set(got) == {"click", "purchase"}  # pruned to the filter set
    for t in got:
        assert got[t] == (by_type[t][0], by_type[t][1])

    r = mod.io_bucketed_join_agg(spark, "u").collect()[0]
    # every user has clicks and purchases in this fixture
    assert r.n_users == 4
    assert r.total_clicks == sum(
        1 for _, row in pdf.iterrows() if row.event_type == "click")


def test_schema_evolution_nulls_not_zeros(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-02-01")
    rows = [(i, base + pd.Timedelta(minutes=i), 100 + i, "t",
             1.0, "{}") for i in range(10)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.io_schema_evolution_merge(spark, "u").collect()[0]
    # 5 even ids carry the new column; their user_ids sum exactly
    assert r.n == 10
    assert r.n_with_new == 5
    assert r.sum_new == sum(100 + i for i in range(0, 10, 2))


def test_checkpoint_exactly_once_fingerprint(spark, monkeypatch):
    import hashlib

    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-02-01")
    rows = [(i, base + pd.Timedelta(minutes=i), i * 7, "t", 1.0, "{}")
            for i in range(64)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stream_checkpoint_exactly_once(spark, "u").collect()[0]

    x = 0
    for i in range(64):
        x ^= int(hashlib.md5(f"{i}|{i*7}".encode()).hexdigest()[:15], 16)
    assert r.n_rows == 64      # nothing dropped, nothing duplicated
    assert r.fingerprint == x  # across the checkpoint restart
    assert r.n_runs == 2


def test_meta_fixed_effect_recovers_constant_effect(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(113)
    base = pd.Timestamp("2024-07-01")
    rows = []
    eid = 0
    # constant +300-cent effect in every stratum, noise sd 50c
    for d in range(14):
        for uid in range(1, 41):
            mu = 10.0 + 3.0 * (uid % 2)
            v = float(mu + rng.normal(0, 0.5))
            rows.append((eid, base + pd.Timedelta(days=d, minutes=eid % 900),
                         uid, "t", v, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_meta_fixed_effect(spark, "u").collect()[0]
    assert r.n_strata == 7
    # pooled effect near +300 cents (micro-units)
    assert 270_000_000 < r.pooled_eff_q6 < 330_000_000


def test_readability_fk_hand_example(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        # doc0: 6 words, 2 sentences, syllables: the(1) cat(1) sat(1)
        # here(2: e,e) on(1) mats(1) = 7
        "text": ["the cat sat. here on mats!", "xyz"],
        "lang": ["en"] * 2, "source": ["s"] * 2, "n_chars": [26, 3]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.doc_id: r for r in mod.text_readability_fk(spark, "u").collect()}

    r = got[0]
    assert (r.n_words, r.n_sents, r.n_syll) == (6, 2, 7)
    expect = (39 * 6 * 1_000_000) // (100 * 2) + (118 * 7 * 1_000_000) // (10 * 6) - 15_590_000
    assert r.fk_grade_q6 == expect
    # consonant-only token: syllable floor of 1, sentence floor of 1
    assert (got[1].n_syll, got[1].n_sents) == (1, 1)


def test_pr_auc_perfect_and_random_ranker(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # perfect separation: correct docs all have conf 1.0, wrong all 0.2
    docs = [("the and of", "en")] * 8 + [("xyz", "de")] * 4
    pdf = pd.DataFrame({
        "doc_id": range(len(docs)), "text": [t for t, _ in docs],
        "lang": [l for _, l in docs], "source": ["s"] * len(docs),
        "n_chars": [len(t) for t, _ in docs]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.ml_pr_auc(spark, "u").collect()[0]
    assert r.n_pos == 8
    # perfect ranking -> PR-AUC ~ 1 (trapezoid on two points)
    assert r.pr_auc_q6 > 950_000


def test_feistel_is_bijective_and_stable(spark, monkeypatch):
    import hashlib

    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-02-01")
    ids = list(range(500)) + [10_000 + i for i in range(100)]
    rows = [(i, base + pd.Timedelta(seconds=k), 1, "t", 1.0, "{}")
            for k, i in enumerate(ids)]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.misc_feistel_permutation(spark, "u").collect()[0]

    bits, mask = mod._FEISTEL_BITS, (1 << mod._FEISTEL_BITS) - 1

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def perm(x):
        l, rr = x >> bits, x & mask
        for rnd in range(1, mod._FEISTEL_ROUNDS + 1):
            l, rr = rr, l ^ (h60(f"f{rnd}|{rr}") & mask)
        return (l << bits) | rr

    ys = [perm(i) for i in ids]
    assert r.n == len(ids)
    assert r.n_distinct == len(set(ys)) == len(ids)  # bijection
    assert r.min_y == min(ys) and r.max_y == max(ys)
    x = 0
    for y in ys:
        x ^= y
    assert r.perm_xor == x
    assert r.n_fixed_points == sum(1 for i, y in zip(ids, ys) if i == y)


def test_price_elasticity_constant_elasticity_model(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    # demand qty per band ~ K * price^-1.5: recover -1.5
    rows = []
    ln = 0
    for pb in range(1, 20):
        price = pb * 5000 + 2500
        qty = int(round(1e10 * price ** (-1.5)))
        # spread qty over rows of quantity <= 50 each (1e10 keeps every
        # band's qty inside the spread budget so no band saturates)
        remaining = min(qty, 20000)
        while remaining > 0:
            q = min(50, remaining)
            ln += 1
            rows.append((ln, 1, 1, ln, float(q), float(price) - 2400.0,
                         0.0, 0.0, "N", "O", pd.Timestamp("2024-01-01")))
            remaining -= q
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.events_price_elasticity(spark, "u").collect()[0]
    assert r.n == 19
    # qty caps distort the top bands slightly; slope close to -1.5
    assert -1_700_000 < r.elasticity_q6 < -1_200_000


def test_transitivity_triangle_vs_star(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    def build(orders):
        rows = []
        ln = 0
        for o, parts in enumerate(orders):
            for p in parts:
                ln += 1
                rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                             pd.Timestamp("2024-01-01")))
        return pd.DataFrame(rows, columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"])

    # one triangle: transitivity = 1
    monkeypatch.setattr(mod, "load",
                        lambda s, d, n: spark.createDataFrame(build([[1, 2, 3]])))
    r = mod.graph_transitivity_global(spark, "u").collect()[0]
    assert (r.n_triangles, r.n_wedges, r.transitivity_q6) == (1, 3, 1_000_000)

    # star (hub 0 with 4 leaves, pairwise orders only): no triangles
    star = [[0, k] for k in range(1, 5)]
    monkeypatch.setattr(mod, "load",
                        lambda s, d, n: spark.createDataFrame(build(star)))
    r2 = mod.graph_transitivity_global(spark, "u").collect()[0]
    assert r2.n_triangles == 0
    assert r2.n_wedges == 6  # C(4,2) at the hub
    assert r2.transitivity_q6 == 0


def test_hdr_buckets_bounded_relative_error(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    base = pd.Timestamp("2024-02-01")
    # gaps: 10us x 500, 1000us x 400, 100000us x 100 (p50=10, p99~100000)
    rows = [(0, base, 1, "t", 1.0, "{}")]
    eid = 1
    t = base
    import itertools as it
    gaps = list(it.chain([10] * 500, [1000] * 400, [100000] * 100))
    for g in gaps:
        t = t + pd.Timedelta(microseconds=g)
        rows.append((eid, t, 1, "t", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.percentile_pm: r.bucket_lo
           for r in mod.agg_hdr_latency_percentiles(spark, "u").collect()}

    exact = sorted(gaps)
    n = len(exact)
    for pm in (500, 990, 999):
        true_v = exact[max(0, (pm * n + 999) // 1000 - 1)]
        # bucket floor is within one HDR bucket (<= 12.5% relative) below
        assert got[pm] <= true_v
        assert got[pm] >= true_v * 0.85
    assert got[500] == 10  # constant-valued bucket reports exactly


def test_dispersion_index_poisson_vs_bursty(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(127)
    base = pd.Timestamp("2024-02-01")
    rows = []
    eid = 0
    for d in range(25):
        # 'poisson': lambda 20; 'bursty': 5 or 60 alternating
        for _ in range(int(rng.poisson(20))):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                         1, "poisson", 1.0, "{}")); eid += 1
        nb = 5 if d % 2 == 0 else 60
        for _ in range(nb):
            rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                         1, "bursty", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.event_type: r.dispersion_q6
           for r in mod.stats_dispersion_index(spark, "u").collect()}

    assert out["poisson"] < 3_000_000       # near-Poisson: D ~ 1
    assert out["bursty"] > 10_000_000       # alternating: heavy overdispersion
    # exact rational identity
    daily = pdf[pdf.event_type == "bursty"].groupby(
        pdf[pdf.event_type == "bursty"]["ts"].dt.date).size()
    n, s, ss = len(daily), int(daily.sum()), int((daily ** 2).sum())
    assert out["bursty"] == (n * ss - s * s) * 1_000_000 // ((n - 1) * s)


def test_msttr_exact_chunks(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    # 55 tokens: chunk0 = 25 distinct, chunk1 = one word repeated 25x,
    # 5-token tail excluded
    words = [f"w{i}" for i in range(25)] + ["same"] * 25 + ["tail"] * 5
    text = " ".join(words)
    pdf = pd.DataFrame({"doc_id": [0], "text": [text], "lang": ["en"],
                        "source": ["s"], "n_chars": [len(text)]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.text_msttr_lexical_diversity(spark, "u").collect()[0]
    assert r.n_chunks == 2
    assert r.sum_types == 25 + 1
    assert r.msttr_q6 == 26 * 1_000_000 // 50


def test_ljung_box_white_vs_autocorrelated(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics4 as mod

    rng = np.random.RandomState(131)
    base = pd.Timestamp("2024-03-01")

    def mk(counts):
        rows = []
        eid = 0
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, base + pd.Timedelta(days=d, seconds=eid % 80000),
                             1, "t", 1.0, "{}")); eid += 1
        return _events(rows)

    # strongly lag-1-autocorrelated: slow sinusoid-ish ramp
    trend = [50 + 3 * min(d, 29 - d) for d in range(30)]
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(mk(trend)))
    r_trend = mod.stats_ljung_box(spark, "u").collect()[0]
    # white noise
    white = [50 + int(rng.randint(-5, 6)) for _ in range(30)]
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(mk(white)))
    r_white = mod.stats_ljung_box(spark, "u").collect()[0]

    assert r_trend.n_days == r_white.n_days == 30
    assert r_trend.q_stat > 30  # heavy autocorrelation
    assert r_white.q_stat < r_trend.q_stat


def test_curriculum_phases_partition_properties(spark, monkeypatch):
    from cudf_spark.queries import analytics4 as mod

    texts = ["a " * (i + 1) + "x" * (3 * i + 1) for i in range(40)]
    pdf = pd.DataFrame({
        "doc_id": range(40), "text": texts, "lang": ["en"] * 40,
        "source": ["s"] * 40, "n_chars": [len(t) for t in texts]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.pipeline_curriculum_phases(spark, "u").collect()

    assert [r.phase for r in rows] == [1, 2, 3, 4]
    assert sum(r.n_docs for r in rows) == 40
    assert all(r.n_docs == 10 for r in rows)  # ntile on 40 docs balances
    # phases are difficulty-ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a.max_difficulty_q6 <= b.min_difficulty_q6
    # membership checksum partitions the id space
    assert sum(r.docid_sum for r in rows) == sum(range(40))
