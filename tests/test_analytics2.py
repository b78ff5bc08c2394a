"""Targeted tests for analytics2: ANOVA vs a numpy reference, Naive Bayes
counts vs pure-python, Bollinger bands vs pandas rolling, and RLE runs vs
itertools.groupby."""

from __future__ import annotations

import itertools

import pytest


def test_anova_oneway_matches_numpy(spark, monkeypatch):
    import numpy as np
    import pandas as pd

    from cudf_spark.queries import analytics2 as mod

    rng = np.random.RandomState(7)
    groups = {"A": rng.randint(1, 20, 400), "N": rng.randint(5, 30, 300),
              "R": rng.randint(1, 40, 500)}
    pdf = pd.DataFrame(
        [(g, float(v)) for g, vs in groups.items() for v in vs],
        columns=["l_returnflag", "l_quantity"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_anova_oneway(spark, "u").collect()[0]

    all_v = np.concatenate(list(groups.values())).astype(float)
    n, k = len(all_v), len(groups)
    grand = all_v.mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k == k and r.n == n
    assert r.ss_between_q6 == pytest.approx(ssb, rel=1e-9)
    assert r.ss_within_q6 == pytest.approx(ssw, rel=1e-9)
    assert r.f_stat_q6 == pytest.approx(f, rel=1e-6)
    assert r.eta_sq_q6 == pytest.approx(ssb / (ssb + ssw), rel=1e-6)


def test_anova_degenerate_single_group_null_f(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics2 as mod

    pdf = pd.DataFrame({"l_returnflag": ["A"] * 5,
                        "l_quantity": [3.0, 4.0, 5.0, 6.0, 7.0]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_anova_oneway(spark, "u").collect()[0]
    assert r.k == 1 and r.f_stat_q6 is None


def test_naive_bayes_counts_and_logprob(spark, monkeypatch):
    import math

    import pandas as pd

    from cudf_spark.queries import analytics2 as mod

    docs = [
        (1, "the cat sat", "en"),
        (2, "the dog sat sat", "en"),
        (3, "le chat le chien", "fr"),
    ]
    pdf = pd.DataFrame(
        [(i, t, l, "s0", len(t)) for i, t, l in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.ml_naive_bayes_train(spark, "u").collect()
    # vocab: the cat sat dog le chat chien -> 7
    by = {(r.lang, r.token): r for r in rows}
    assert by[("en", "sat")].c == 3
    assert by[("en", "sat")].rnk == 1
    # en totals: the(2) cat(1) sat(3) dog(1) = 7 tokens
    assert by[("en", "sat")].logprob_q6 == pytest.approx(
        round(math.log((3 + 1) / (7 + 7)), 6), abs=1e-9
    )
    # fr: le(2) chat(1) chien(1) = 4 tokens
    assert by[("fr", "le")].rnk == 1
    assert by[("fr", "le")].logprob_q6 == pytest.approx(
        round(math.log((2 + 1) / (4 + 7)), 6), abs=1e-9
    )
    # rank tiebreak on token: chat before chien at equal count
    assert by[("fr", "chat")].rnk == 2 and by[("fr", "chien")].rnk == 3


def test_bollinger_matches_pandas_rolling(spark, monkeypatch):
    import numpy as np
    import pandas as pd

    from cudf_spark.queries import analytics2 as mod

    rng = np.random.RandomState(11)
    n = 200
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": np.repeat(np.arange(4, dtype="int64"), n // 4),
        "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    monkeypatch.setattr(mod, "load", lambda s, d, n_: spark.createDataFrame(pdf))
    got = {r.event_id: r for r in mod.win_bollinger_bands(spark, "u").collect()}

    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        cents = (g.value * 100).round().astype("int64")
        m = cents.rolling(20, min_periods=1).mean() / 100
        s = cents.rolling(20, min_periods=1).std(ddof=0) / 100
        cnt = cents.rolling(20, min_periods=1).count()
        for eid, mm, ss, cc, vv in zip(g.event_id, m, s, cnt, g.value):
            r = got[eid]
            assert r.nw == int(cc)
            assert r.mid_q6 == pytest.approx(mm, abs=2e-6)
            ss = 0.0 if np.isnan(ss) else ss
            assert r.upper_q6 == pytest.approx(mm + 2 * ss, abs=5e-6)
            assert r.lower_q6 == pytest.approx(mm - 2 * ss, abs=5e-6)
            want_outside = int(cc == 20 and abs(vv - mm) > 2 * ss)
            assert r.outside == want_outside


def test_rle_encode_matches_groupby(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics2 as mod

    rows = []
    seqs = {10: "AAARRNNA", 11: "R", 12: "NNNNN", 13: "ARAR"}
    for ok, seq in seqs.items():
        for i, ch in enumerate(seq):
            rows.append((ok, i + 1, ch))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber", "l_returnflag"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = mod.misc_rle_encode(spark, "u").collect()

    want = []
    for ok, seq in sorted(seqs.items()):
        start = 1
        for rid, (ch, grp) in enumerate(itertools.groupby(seq), start=1):
            ln = len(list(grp))
            want.append((ok, rid, ch, ln, start))
            start += ln
    assert [(r.l_orderkey, r.run_id, r.flag, r.run_len, r.start_ln) for r in got] == want


def test_rle_encode_tied_linenumbers_deterministic(spark, monkeypatch):
    """Duplicate line numbers segment by (linenumber, flag) — total order."""
    import pandas as pd

    from cudf_spark.queries import analytics2 as mod

    pdf = pd.DataFrame(
        [(1, 1, "R"), (1, 1, "A"), (1, 2, "A")],
        columns=["l_orderkey", "l_linenumber", "l_returnflag"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = [(r.run_id, r.flag, r.run_len) for r in mod.misc_rle_encode(spark, "u").collect()]
    # order: (1,A), (1,R), (2,A) -> runs A(1), R(1), A(1); run_id 1-based
    assert got == [(1, "A", 1), (2, "R", 1), (3, "A", 1)]
