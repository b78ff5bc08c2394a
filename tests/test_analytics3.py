"""Targeted tests for analytics3: interval-overlap join vs a brute-force
nested loop, Kendall tau-b vs a pure-python pair count, k-core peel vs an
in-memory peeler, Hellinger drift vs numpy, Cohen's kappa vs the hand
formula, and bitpack widths vs int.bit_length."""

from __future__ import annotations

import itertools
import math

import pandas as pd
import pytest


def _events(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_interval_overlap_matches_bruteforce(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-03-01")
    rows = []
    for eid in range(400):
        uid = int(rng.randint(0, 12))
        ts = base + pd.Timedelta(seconds=int(rng.randint(0, 4 * 86400)))
        rows.append((eid, ts, uid, "click", 1.0, "{}"))
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))

    got = {
        r.user_id: (r.n_overlaps, r.n_partners)
        for r in mod.join_interval_overlap(spark, "u").collect()
    }

    # brute-force sessions + O(n^2) overlap scan
    sessions = []
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        us = (g["ts"].astype("int64") // 1000).tolist()
        start = prev = us[0]
        for t in us[1:]:
            if t - prev > 1_800_000_000:
                sessions.append((uid, start, prev))
                start = t
            prev = t
        sessions.append((uid, start, prev))
    exp: dict[int, list[int]] = {}
    for (u1, s1, e1), (u2, s2, e2) in itertools.permutations(sessions, 2):
        if u1 != u2 and s1 <= e2 and s2 <= e1:
            exp.setdefault(u1, []).append(u2)
    expected = {
        u: (len(vs), len(set(vs)))
        for u, vs in sorted(exp.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:50]
    }
    assert got == expected


def test_kendall_tau_matches_pair_count(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(5)
    n = 600
    x = rng.randint(1, 15, n)
    y_raw = x * 3000 + rng.randint(-20000, 20000, n)
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * n,
            "l_quantity": x.astype(float),
            "l_extendedprice": y_raw.astype(float),
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n_: spark.createDataFrame(pdf))
    r = mod.stats_kendall_tau_binned(spark, "u").collect()[0]

    yb = np.floor(y_raw / 5000.0).astype(int)
    nc = nd = n1 = n2 = 0
    for i, j in itertools.combinations(range(n), 2):
        dx, dy = x[j] - x[i], yb[j] - yb[i]
        if dx == 0:
            n1 += 1
            continue
        if dy == 0:
            n2 += 1
        elif (dx > 0) == (dy > 0):
            nc += 1
        else:
            nd += 1
    n0 = n * (n - 1) // 2
    # n1 in the query counts ALL x-tied pairs (incl. both-tied), n2 all
    # y-tied pairs — recount with that convention.
    n1_all = sum(
        c * (c - 1) // 2 for c in pd.Series(x).value_counts().tolist()
    )
    n2_all = sum(
        c * (c - 1) // 2 for c in pd.Series(yb).value_counts().tolist()
    )
    tau = (nc - nd) / (math.sqrt(n0 - n1_all) * math.sqrt(n0 - n2_all))
    assert (r.nc, r.nd) == (nc, nd)
    assert (r.n1, r.n2) == (n1_all, n2_all)
    assert r.tau_b_q6 == math.floor(1_000_000 * tau)
    assert r.tau_b_q6 > 500_000  # strongly monotone by construction


def test_kcore_peel_matches_python(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(3)
    rows = []
    ln = 0
    for o in range(120):
        parts = rng.choice(40, size=rng.randint(2, 6), replace=False)
        for p in parts:
            ln += 1
            rows.append((o, int(p), 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = [(r.node, r.deg) for r in mod.graph_kcore_peel(spark, "u").collect()]

    edges = set()
    for _, g in pdf.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        edges.update((a, b) for a, b in itertools.combinations(ps, 2))
    for _ in range(mod._KCORE_ROUNDS):
        deg: dict[int, int] = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, c in deg.items() if c >= mod._KCORE_K}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    expected = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == expected


def test_hellinger_drift_matches_numpy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    docs = {
        "a": ["x x y z", "y y z w"],
        "b": ["x q q q", "q q x w"],
    }
    rows = []
    i = 0
    for src, texts in docs.items():
        for t in texts:
            rows.append((i, t, "en", src, len(t)))
            i += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.source: r for r in mod.text_hellinger_drift(spark, "u").collect()}

    from collections import Counter

    per = {s: Counter(" ".join(ts).split()) for s, ts in docs.items()}
    glob = Counter()
    for c in per.values():
        glob.update(c)
    ng = sum(glob.values())
    for src, cnt in per.items():
        ns = sum(cnt.values())
        a9 = sum(
            math.floor(1e9 * math.sqrt((cs * glob[t]) / (ns * ng)))
            for t, cs in cnt.items()
        )
        r = got[src]
        assert (r.n_tokens, r.vocab) == (ns, len(cnt))
        assert r.affinity_n9 == a9
        assert r.hellinger_sq_q6 == (1_000_000_000 - a9) // 1000


def test_cohens_kappa_hand_formula(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    # 'the' is an en marker; docs with none default to... check via the
    # actual predictor — we only verify the kappa arithmetic here, against
    # the confusion matrix the query itself implies.
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": ["the cat", "the dog", "el perro", "der hund und", "le chat et", "xyz"],
            "lang": ["en", "en", "es", "de", "fr", "zh"],
            "source": ["s"] * 6,
            "n_chars": [7] * 6,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_cohens_kappa(spark, "u").collect()[0]
    assert r.n == 6
    # kappa identity holds whatever the predictor did
    assert r.kappa_q6 == (1_000_000 * (r.n * r.agree - r.pe_num)) // (
        r.n * r.n - r.pe_num
    )
    assert r.po_q6 == 1_000_000 * r.agree // r.n


def test_bitpack_width_matches_bit_length(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(9)
    rows = []
    for i in range(200):
        rows.append((i, 0, 7, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(rng.randint(0, 300)))))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.misc_bitpack_for_blocks(spark, "u").collect()[0]

    days = sorted(
        (ts - pd.Timestamp("1970-01-01")).days
        for ts in pdf.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])["l_shipdate"]
    )
    # sorted by shipdate first => same block assignment as the query
    packed = raw = 0
    blocks = 0
    for b in range(0, len(days), 64):
        blk = days[b : b + 64]
        rng_ = max(blk) - min(blk)
        width = rng_.bit_length()
        packed += 64 + len(blk) * width
        raw += 64 * len(blk)
        blocks += 1
    assert (r.n_blocks, r.n_rows) == (blocks, 200)
    assert (r.packed_bits, r.raw_bits) == (packed, raw)
    assert r.ratio_q6 == packed * 1_000_000 // raw


def test_freshness_gap_and_stale_flags(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    rows = []
    eid = 0
    base = pd.Timestamp("2024-05-01")
    # 12 days of ~10 events, day 8 missing entirely, day 10 only 2 events
    for d in range(12):
        if d == 8:
            continue
        k = 2 if d == 10 else 10
        for i in range(k):
            rows.append((eid, base + pd.Timedelta(days=d, minutes=i), 1, "t", 1.0, "{}"))
            eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {str(r.day): r for r in mod.dq_freshness_gaps(spark, "u").collect()}
    assert len(out) == 12  # spine fills the missing day
    assert out["2024-05-09"].cnt == 0 and out["2024-05-09"].is_gap == 1
    assert out["2024-05-11"].cnt == 2 and out["2024-05-11"].is_stale == 1
    assert out["2024-05-01"].trail_med is None  # no trailing history
    assert out["2024-05-05"].trail_med == 10 and out["2024-05-05"].is_stale == 0


def test_concurrency_peak_matches_bruteforce(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(21)
    base = pd.Timestamp("2024-06-03")
    rows = []
    for eid in range(300):
        ts = base + pd.Timedelta(seconds=int(rng.randint(0, 2 * 86400)))
        rows.append((eid, ts, 1, "click", 1.0, "{}"))
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {
        str(r.day): (r.peak_concurrency, r.n_events)
        for r in mod.events_concurrency_peak(spark, "u").collect()
    }

    for day, g in pdf.groupby(pdf["ts"].dt.date):
        us = sorted((g["ts"].astype("int64") // 1000).tolist())
        pts = sorted(
            [(t, 1) for t in us] + [(t + 300_000_000, -1) for t in us],
            key=lambda p: (p[0], p[1]),
        )
        cur = peak = 0
        for _, d in pts:
            cur += d
            peak = max(peak, cur)
        assert got[str(day)] == (peak, len(us))


def test_time_to_convert_matches_pandas(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(13)
    base = pd.Timestamp("2024-02-01")
    rows = []
    eid = 0
    deltas_us = []
    for uid in range(40):
        s = base + pd.Timedelta(seconds=int(rng.randint(0, 86400)))
        rows.append((eid, s, uid, "signup", 1.0, "{}")); eid += 1
        if uid % 4 != 0:  # 30 of 40 convert
            d = int(rng.randint(60, 10 * 86400))
            rows.append((eid, s + pd.Timedelta(seconds=d), uid, "purchase", 1.0, "{}")); eid += 1
            deltas_us.append(d * 1_000_000)
        else:  # pre-signup purchase must NOT count
            rows.append((eid, s - pd.Timedelta(seconds=500), uid, "purchase", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.events_time_to_convert(spark, "u").collect()[0]

    dm = sorted(d // 60_000_000 for d in deltas_us)
    n = len(dm)
    med = min(v for i, v in enumerate(dm, 1) if 2 * i >= n)
    # p90 via the same cumulative rank rule on the value lattice
    from collections import Counter

    hist = sorted(Counter(dm).items())
    cum = 0
    p90 = None
    for v, c in hist:
        cum += c
        if p90 is None and 10 * cum >= 9 * n:
            p90 = v
    assert r.n_converted == n == 30
    assert r.med_min == med
    assert r.p90_min == p90
    assert r.mean_us == sum(deltas_us) // n


def test_linreg_matches_numpy_lstsq(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(17)
    n = 500
    x1 = rng.randint(1, 50, n)
    x2 = rng.randint(0, 11, n)
    y_cents = 100 * x1 * 37 - 55 * x2 * 100 + rng.randint(-5000, 5000, n) + 250_000
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * n,
            "l_quantity": x1.astype(float),
            "l_discount": x2 / 100.0,
            "l_extendedprice": y_cents / 100.0,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n_: spark.createDataFrame(pdf))
    r = mod.ml_linreg_normal_eq(spark, "u").collect()[0]

    X = np.column_stack([np.ones(n), x1, x2]).astype(float)
    beta, *_ = np.linalg.lstsq(X, y_cents.astype(float), rcond=None)
    assert r.b0_q6 == pytest.approx(beta[0] * 1e6, abs=2)
    assert r.b1_q6 == pytest.approx(beta[1] * 1e6, abs=2)
    assert r.b2_q6 == pytest.approx(beta[2] * 1e6, abs=2)
    # recovered coefficients are near the generating model
    assert abs(r.b1_q6 / 1e6 - 3700) < 20
    assert abs(r.b2_q6 / 1e6 + 5500) < 400


def test_late_arrival_audit_counts_boundary_rows(spark, monkeypatch):
    from cudf_spark.queries import streaming_batch as mod

    # hand-built stream: batch 0 = arrival days 1..10, one row of day 10
    # delayed into batch 1 with event time 30 min before batch-0 max.
    base = pd.Timestamp("2024-01-01")
    rows = [
        # event_id % 7 == 0 -> no delay
        (0, base + pd.Timedelta(days=2), 1, "t", 1.0, "{}"),
        (7, base + pd.Timedelta(days=9, hours=23, minutes=50), 1, "t", 1.0, "{}"),
        # event_id 14: no delay, lands late in day 10 -> batch 0 max
        (14, base + pd.Timedelta(days=9, hours=23, minutes=59), 1, "t", 1.0, "{}"),
        # event_id 6 -> delay 6*5=30 min: event ts day 10 23:40 (19 min
        # older than batch-0 max => LATE), arrival day 11 00:10 -> batch 1
        (6, base + pd.Timedelta(days=9, hours=23, minutes=40), 1, "t", 1.0, "{}"),
        (21, base + pd.Timedelta(days=15), 1, "t", 1.0, "{}"),
    ]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.batch: r for r in mod.stream_late_arrival_audit(spark, "u").collect()}
    assert out[0].n_rows == 3 and out[0].n_late == 0
    assert out[1].n_rows == 2 and out[1].n_late == 1  # the 23:40 row


def test_markov_stationary_integer_sim(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(31)
    types = ["a", "b", "c"]
    rows = []
    eid = 0
    base = pd.Timestamp("2024-04-01")
    for uid in range(20):
        for step in range(rng.randint(3, 12)):
            rows.append((eid, base + pd.Timedelta(minutes=eid), uid,
                         types[rng.randint(0, 3)], 1.0, "{}"))
            eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.state: (r.n_out, r.stationary_q6)
           for r in mod.events_markov_stationary(spark, "u").collect()}

    # integer simulation mirroring the query's truncating arithmetic
    from collections import Counter
    trans = Counter()
    for uid, g in pdf.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    states = sorted({a for a, _ in trans})
    r = {s: sum(c for (a, _), c in trans.items() if a == s) for s in states}
    v = {s: 1_000_000 // len(states) for s in states}
    for _ in range(5):
        nv = {}
        for (i, j), c in trans.items():
            nv[j] = nv.get(j, 0) + (v.get(i, 0) * c) // r[i]
        v = nv
    for s in states:
        assert got[s] == (r[s], v.get(s, 0))
    # mass approximately conserved (truncation dust only)
    assert 0 <= 1_000_000 - sum(v.values()) < 1000


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_canonical_xy2d(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(41)
    rows = []
    for i in range(300):
        rows.append((i // 4, int(rng.randint(0, 5000)), int(rng.randint(0, 5000)),
                     i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.bucket: (r.n, r.min_x, r.max_x, r.min_y, r.max_y)
           for r in mod.misc_hilbert_layout(spark, "u").collect()}

    from collections import defaultdict
    agg = defaultdict(list)
    for _, row in pdf.iterrows():
        x, y = row.l_partkey % 256, row.l_suppkey % 256
        agg[_xy2d(256, x, y) // 1024].append((x, y))
    expected = {
        b: (len(v), min(p[0] for p in v), max(p[0] for p in v),
            min(p[1] for p in v), max(p[1] for p in v))
        for b, v in agg.items()
    }
    assert got == expected


def test_hilbert_is_bijective_on_grid(spark):
    # canonical property pin: xy2d is a bijection [0,256)^2 -> [0,65536)
    seen = set()
    for x in range(0, 256, 17):
        for y in range(0, 256, 13):
            seen.add(_xy2d(256, x, y))
    assert len(seen) == len(range(0, 256, 17)) * len(range(0, 256, 13))
    # adjacency property: consecutive d differ by 1 step in the plane
    d2xy = {}
    for x in range(64):
        for y in range(64):
            d2xy[_xy2d(64, x, y)] = (x, y)
    for d in range(0, 64 * 64 - 1):
        (x1, y1), (x2, y2) = d2xy[d], d2xy[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_pmi_collocations_bruteforce(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    docs = ["new york is big", "new york city", "big data new york",
            "new york new york", "data is big data"] * 3
    pdf = pd.DataFrame({
        "doc_id": range(len(docs)), "text": docs,
        "lang": ["en"] * len(docs), "source": ["s"] * len(docs),
        "n_chars": [len(t) for t in docs]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = [(r.x, r.y, r.c_xy, r.lift_q6)
           for r in mod.text_pmi_collocations(spark, "u").collect()]

    from collections import Counter
    import math as m
    uni, big = Counter(), Counter()
    for t in docs:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    exp = []
    for (x, y), c in big.items():
        if c >= 5:
            lift = (c / nb) / ((uni[x] / nu) * (uni[y] / nu))
            exp.append((x, y, c, m.floor(1e6 * lift)))
    exp.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert out == exp[:30]
    # 'new york' is a confirmed collocation (PMI ranks rarer pairs like
    # 'is big' above it — lift rewards low marginals, as designed)
    assert ("new", "york", 15) in [(x, y, c) for x, y, c, _ in out]


def test_soundex_census_trap_words(spark):
    from pyspark.sql import functions as F

    traps = {"robert": "R163", "rupert": "R163", "ashcraft": "A261",
             "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
             "honeyman": "H555", "hannah": "H500"}
    df = spark.createDataFrame([(w,) for w in traps], "w string")
    got = {r.w: r.sx for r in df.select("w", F.soundex("w").alias("sx")).collect()}
    assert got == traps


def test_survival_km_matches_lifelines_style(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(23)
    base = pd.Timestamp("2024-07-01")
    rows = []
    eid = 0
    users = []
    for uid in range(60):
        f = int(rng.randint(0, 5))
        dur = int(rng.randint(0, 20))
        rows.append((eid, base + pd.Timedelta(days=f), uid, "t", 1.0, "{}")); eid += 1
        rows.append((eid, base + pd.Timedelta(days=f + dur), uid, "t", 1.0, "{}")); eid += 1
        users.append((uid, f, f + dur))
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.t: (r.n_risk, r.d_churn, r.surv_q6)
           for r in mod.events_survival_km(spark, "u").collect()}

    gmax = max(l for _, _, l in users)
    durs = [(l - f, 1 if l <= gmax - 3 else 0) for _, f, l in users]
    ts = sorted({t for t, _ in durs})
    s = 1_000_000
    for t in ts:
        n_risk = sum(1 for d, _ in durs if d >= t)
        d_ev = sum(1 for d, c in durs if d == t and c == 1)
        s = (s * (n_risk - d_ev)) // n_risk
        assert got[t] == (n_risk, d_ev, s)
    # survival is monotone nonincreasing and starts near 1
    vals = [got[t][2] for t in ts]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_theil_u_matches_numpy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(29)
    langs = ["en", "de", "fr"]
    sources = ["a", "b", "c", "d"]
    rows = []
    for i in range(400):
        li = rng.randint(0, 3)
        # correlated: source leans on lang
        si = (li + rng.randint(0, 2)) % 4
        rows.append((i, "t", langs[li], sources[si], 1))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_theil_u(spark, "u").collect()[0]

    def ent(counts):
        p = np.array(counts, dtype=float)
        p /= p.sum()
        return float(-(p * np.log2(p)).sum())

    joint = pdf.groupby(["lang", "source"]).size()
    hl = ent(pdf.groupby("lang").size().values)
    hs = ent(pdf.groupby("source").size().values)
    hj = ent(joint.values)
    mi = hl + hs - hj
    assert r.n == 400
    assert r.h_lang_q6 == pytest.approx(hl, abs=2e-6)
    assert r.h_joint_q6 == pytest.approx(hj, abs=2e-6)
    assert r.mi_q6 == pytest.approx(mi, abs=3e-6)
    assert r.u_lang_given_source_q6 == pytest.approx(mi / hl, abs=3e-6)
    assert 0 < r.u_lang_given_source_q6 < 1  # correlated but not determined


def test_consistent_ring_assignment_bruteforce(spark, monkeypatch):
    import hashlib

    from cudf_spark.queries import analytics3 as mod

    sup = pd.DataFrame({"s_suppkey": range(1, 8), "s_name": ["s"] * 7,
                        "s_nationkey": [0] * 7, "s_acctbal": [0.0] * 7})
    part = pd.DataFrame({"p_partkey": range(1, 200), "p_name": ["p"] * 199,
                         "p_brand": ["b"] * 199, "p_type": ["t"] * 199,
                         "p_size": [1] * 199, "p_retailprice": [1.0] * 199})
    tables = {"supplier": sup, "part": part}
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(tables[n]))
    got = {r.s_suppkey: (r.n_keys, r.share_q6)
           for r in mod.misc_consistent_hash_ring(spark, "u").collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ring = sorted((h60(f"{s}:{v}"), s) for s in sup.s_suppkey for v in range(3))
    from collections import Counter
    owners = Counter()
    for p in part.p_partkey:
        kh = h60(str(p))
        nxt = [e for e in ring if e[0] >= kh]
        owners[(nxt[0] if nxt else ring[0])[1]] += 1
    for s in sup.s_suppkey:
        assert got[s] == (owners.get(s, 0), owners.get(s, 0) * 1_000_000 // 199)
    assert sum(n for n, _ in got.values()) == 199  # every key owned once


def test_stump_split_matches_exhaustive(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(37)
    n = 800
    x = rng.randint(1, 30, n)
    # piecewise target: clear split at x <= 12
    y = np.where(x <= 12, 1000, 9000) + rng.randint(-300, 300, n)
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * n,
            "l_quantity": x.astype(float),
            "l_extendedprice": y / 100.0,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n_: spark.createDataFrame(pdf))
    r = mod.ml_boosted_stump_split(spark, "u").collect()[0]

    best = None
    yc = y.astype(np.int64)
    S, N = yc.sum(), n
    for s in sorted(set(x)):
        mask = x <= s
        nl = int(mask.sum())
        if nl == n:
            continue
        sl = int(yc[mask].sum())
        gain = sl * sl / nl + (S - sl) ** 2 / (N - nl) - S * S / N
        key = (int(np.floor(gain / 1e6)), -s)
        if best is None or key > best[0]:
            best = (key, s, nl)
    assert r.split_x == best[1] == 12
    assert r.n_l == best[2]
    assert r.gain_e6 == best[0][0]


def test_bfs_hops_matches_networkx_style(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(43)
    rows = []
    ln = 0
    for o in range(80):
        parts = rng.choice(60, size=rng.randint(2, 5), replace=False)
        for p in parts:
            ln += 1
            rows.append((o, int(p), 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.hop: (r.n_nodes, r.min_node, r.max_node)
           for r in mod.graph_bfs_hops(spark, "u").collect()}

    import itertools as it
    adj: dict[int, set[int]] = {}
    for _, g in pdf.groupby("l_orderkey"):
        for u, v in it.permutations(set(g["l_partkey"]), 2):
            adj.setdefault(u, set()).add(v)
    deg = {u: len(vs) for u, vs in adj.items()}
    seed = max(deg, key=lambda u: (deg[u], -u))
    dist = {seed: 0}
    frontier = [seed]
    for hop in range(1, mod._BFS_ROUNDS + 1):
        nxt = sorted({v for u in frontier for v in adj[u] if v not in dist})
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    from collections import defaultdict
    lv = defaultdict(list)
    for node, h in dist.items():
        lv[h].append(node)
    expected = {h: (len(ns), min(ns), max(ns)) for h, ns in lv.items()}
    assert got == expected


def test_bfs_min_hop_fold_keeps_earliest_hop(spark, monkeypatch):
    """The r11 one-aggregate round folds distinct + anti-join into ONE
    min(hop) groupBy — a visited node re-reached by a later frontier must
    keep its EARLIER hop. Chain with a back-edge exercises the fold's
    kernel: parts 0-1-2-3-4 in consecutive pair-orders plus (0,2); the
    seed (node 2, the unique degree-3 node) and its hop-1 shell are
    re-reached every round and must stay at hop 0/1 while the frontier
    walks to node 4."""
    from cudf_spark.queries import analytics3 as mod

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)]
    rows = []
    ln = 0
    for o, (a, b) in enumerate(pairs):
        for p in (a, b):
            ln += 1
            rows.append((o, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.hop: (r.n_nodes, r.min_node, r.max_node)
           for r in mod.graph_bfs_hops(spark, "u").collect()}
    # seed = node 2 (deg 3: {0, 1, 3}); hop 1 = {0, 1, 3} — each
    # re-reachable from the others at hop 2, min keeps 1 — hop 2 = {4}
    assert got == {0: (1, 2, 2), 1: (3, 0, 3), 2: (1, 4, 4)}


def test_neyman_allocation_sums_to_budget(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(47)
    rows = []
    i = 0
    for src, (mu, sd, k) in {
        "a": (100, 5, 50), "b": (200, 60, 50), "c": (150, 30, 80),
        "d": (90, 0, 40),  # zero-variance stratum -> zero allocation
    }.items():
        for _ in range(k):
            rows.append((i, "t", "en", src, int(max(1, rng.normal(mu, sd)))))
            i += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.source: r for r in mod.doc_neyman_allocation(spark, "u").collect()}

    assert sum(r.alloc for r in out.values()) == 1000
    assert out["d"].alloc == 0  # S_h = 0 -> no weight
    # high-spread stratum b gets more than same-size low-spread a
    assert out["b"].alloc > out["a"].alloc
    # quotas match numpy-computed Neyman weights
    w = {}
    for src, g in pdf.groupby("source"):
        v = g["n_chars"].to_numpy(dtype=float)
        w[src] = len(v) * float(np.sqrt(((v - v.mean()) ** 2).mean()))
    tw = sum(w.values())
    for src in w:
        assert out[src].quota_q6 == pytest.approx(1e6 * w[src] / tw, abs=2)


def test_rolling_mode_matches_pandas_apply(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(53)
    base = pd.Timestamp("2024-08-01")
    rows = []
    for eid in range(500):
        rows.append((eid, base + pd.Timedelta(minutes=eid), int(rng.randint(0, 5)),
                     "t", float(rng.randint(0, 10)) / 4.0, "{}"))
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {(r.user_id, r.event_id): (r.mode_cents, r.mode_count)
           for r in mod.win_rolling_mode(spark, "u").collect()}

    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = ((g["value"] * 100).round().astype(int) % 50).tolist()
        eids = g["event_id"].tolist()
        for i in range(len(cents)):
            frame = cents[max(0, i - 9): i + 1]
            from collections import Counter
            cnt = Counter(frame)
            best = min(cnt, key=lambda v: (-cnt[v], v))
            assert got[(uid, eids[i])] == (best, cnt[best])


def test_hamming_topk_matches_numpy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(59)
    vecs = rng.normal(size=(40, 64)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [v.tolist() for v in vecs],
         "label": [0] * 40}
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = [(r.qid, r.vec_id, r.hamming, r.rk)
           for r in mod.ann_hamming_topk(spark, "u").collect()]

    signs = (vecs >= 0)
    exp = []
    for qid in range(5):
        dists = []
        for vid in range(40):
            if vid == qid:
                continue
            h = int((signs[qid] != signs[vid]).sum())
            dists.append((h, vid))
        dists.sort()
        for rk, (h, vid) in enumerate(dists[:10], 1):
            exp.append((qid, vid, h, rk))
    assert got == exp


def test_roaring_plan_container_rules(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    # chunk 0: a dense run 0..99  -> run container (2+4*1=6 bytes)
    # chunk 1: 3000 scattered evens -> array (6000B) beats bitmap, runs 3000*4+2
    rows = []
    ln = 0
    for v in range(100):
        ln += 1
        rows.append((v, 1, 1, ln, 1.0, 1.0, 0.0, 0.0, "A", "O",
                     pd.Timestamp("2024-01-01")))
    for i in range(3000):
        ln += 1
        rows.append((65536 + 2 * i, 1, 1, ln, 1.0, 1.0, 0.0, 0.0, "A", "O",
                     pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.chunk: r for r in mod.misc_roaring_container_plan(spark, "u").collect()}
    assert out[0].card == 100 and out[0].n_runs == 1
    assert out[0].container == "run" and out[0].bytes_run == 6
    assert out[1].card == 3000 and out[1].n_runs == 3000
    assert out[1].container == "array"  # 6000 < 8192 < 12002


def test_shard_rebalance_moves_reduce_imbalance(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(61)
    sizes = {1: 500, 2: 300, 3: 100, 4: 80, 5: 20}
    rows = []
    ln = 0
    for supp, n in sizes.items():
        for _ in range(n):
            ln += 1
            rows.append((ln, 1, supp, ln, 1.0, 1.0, 0.0, 0.0, "A", "O",
                         pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = [(r.rk, r.from_supp, r.to_supp, r.moved)
           for r in mod.misc_shard_rebalance_pairing(spark, "u").collect()]

    target = 1000 // 5  # 200
    # donors: 1 (+300), 2 (+100); receivers: 5 (-180), 4 (-120), 3 (-100)
    assert out[0] == (1, 1, 5, 180)  # min(300, 180)
    assert out[1] == (2, 2, 4, 100)  # min(100, 120)
    # every move is positive and bounded by donor surplus
    for _, f, t, m in out:
        assert m > 0
        assert sizes[f] - target >= m


def test_markov_entropy_rate_matches_numpy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(67)
    types = ["a", "b", "c", "d"]
    rows = []
    eid = 0
    base = pd.Timestamp("2024-04-01")
    for uid in range(25):
        for _ in range(rng.randint(4, 15)):
            rows.append((eid, base + pd.Timedelta(minutes=eid), uid,
                         types[rng.randint(0, 4)], 1.0, "{}"))
            eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.events_markov_entropy_rate(spark, "u").collect()[0]

    from collections import Counter
    trans = Counter()
    for uid, g in pdf.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        for x, y in zip(seq, seq[1:]):
            trans[(x, y)] += 1
    states = sorted({x for x, _ in trans})
    rr = {s: sum(c for (x, _), c in trans.items() if x == s) for s in states}
    v = {s: 1_000_000 // len(states) for s in states}
    for _ in range(5):
        nv = {}
        for (x, y), c in trans.items():
            nv[y] = nv.get(y, 0) + (v.get(x, 0) * c) // rr[x]
        v = nv
    h9 = 0
    for (x, y), c in trans.items():
        p = c / rr[x]
        h9 += math.floor(-1e9 * (v.get(x, 0) / 1e6) * p * math.log2(p))
    assert r.k == len(states)
    assert r.h_n9 == h9
    # entropy rate of a 4-state chain is in (0, 2] bits
    assert 0 < r.entropy_rate_q6 <= 2_000_000


def test_textrank_matches_integer_pagerank(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod
    from cudf_spark.operators.graphs import PR_FP_SCALE

    docs = ["spark shuffles data fast", "data moves fast in spark",
            "slow scans hurt spark data"] * 2
    pdf = pd.DataFrame({
        "doc_id": range(len(docs)), "text": docs,
        "lang": ["en"] * len(docs), "source": ["s"] * len(docs),
        "n_chars": [len(t) for t in docs]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = [(r.word, r.score_q7) for r in mod.text_textrank_keywords(spark, "u").collect()]

    edges = set()
    for t in docs:
        ws = t.split()
        for i, x in enumerate(ws):
            for j in (i + 1, i + 2):
                if j < len(ws) and ws[j] != x:
                    edges.add((x, ws[j]))
    sym = edges | {(b, a) for a, b in edges}
    nodes = sorted({a for a, _ in sym})
    deg = {n: sum(1 for a, _ in sym if a == n) for n in nodes}
    s = PR_FP_SCALE
    pr = {n: s // len(nodes) for n in nodes}
    for _ in range(5):
        contrib = {}
        for a, b in sym:
            contrib[b] = contrib.get(b, 0) + pr[a] // deg[a]
        base = (s - s * 17 // 20) // len(nodes)
        pr = {n: base + (17 * contrib.get(n, 0)) // 20 for n in nodes}
    exp = sorted(((n, pr[n] // 100000000) for n in nodes),
                 key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == exp
    assert got[0][0] in {"spark", "data"}  # hub words dominate


def test_modularity_matches_hand_lpa(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(71)
    # two dense cliques bridged by one order
    rows = []
    ln = 0
    orders = []
    for o in range(30):
        grp = [0, 1, 2, 3] if o % 2 == 0 else [10, 11, 12, 13]
        parts = list(rng.choice(grp, size=3, replace=False))
        orders.append(parts)
        for p in parts:
            ln += 1
            rows.append((o, int(p), 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         pd.Timestamp("2024-01-01")))
    # bridge
    rows.append((99, 0, 1, ln + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 pd.Timestamp("2024-01-01")))
    rows.append((99, 10, 1, ln + 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.graph_modularity_score(spark, "u").collect()[0]

    import itertools as it
    eu = set()
    for _, g in pdf.groupby("l_orderkey"):
        for a, b in it.combinations(sorted(set(g["l_partkey"])), 2):
            eu.add((a, b))
    sym = eu | {(b, a) for a, b in eu}
    nodes = sorted({a for a, _ in sym})
    lab = {n: n for n in nodes}
    for _ in range(3):
        from collections import Counter
        new = {}
        for n in nodes:
            cnt = Counter(lab[v] for u, v in sym if u == n)
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    m = len(eu)
    deg = Counter(a for a, _ in sym)
    comms = sorted(set(lab.values()))
    s9 = 0
    for cm in comms:
        e_in = sum(1 for a, b in eu if lab[a] == cm and lab[b] == cm)
        a_i = sum(deg[n] for n in nodes if lab[n] == cm)
        s9 += math.floor(1e9 * (e_in / m - (a_i / (2 * m)) ** 2))
    assert r.m == m
    assert r.n_communities == len(comms)
    assert r.modularity_q6 == s9 // 1000
    # two cliques + a weak bridge => strongly modular partition
    assert r.modularity_q6 > 300_000


def test_calibration_ece_integer_identity(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": ["the and of", "the cat", "el la es", "der und die",
                     "le la et", "xyz", "the el", "und the of"],
            "lang": ["en", "en", "es", "de", "fr", "zh", "es", "en"],
            "source": ["s"] * 8,
            "n_chars": [10] * 8,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.ml_calibration_ece(spark, "u").collect()

    n = sum(r.n_docs for r in rows)
    assert n == 8
    # ECE identity: sum over bins of |correct*1e6 - conf_sum| // N
    gap_sum = sum(abs(r.n_correct * 1_000_000 - r.n_docs * r.avg_conf_q6
                      - (r.n_docs * r.avg_conf_q6 == 0) * 0) for r in rows)
    # avg_conf is truncated; recompute from gap_q6 * n_docs bound instead
    for r in rows:
        assert 0 <= r.acc_q6 <= 1_000_000
        assert 0 <= r.avg_conf_q6 <= 1_000_000
        assert r.ece_q6 == rows[0].ece_q6  # constant column
    # zero-evidence doc ('xyz') lands in bin 2 with conf 0.2
    assert any(r.bin == 2 and r.n_docs >= 1 for r in rows)


def test_merkle_tree_levels_and_sensitivity(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    base = pd.Timestamp("2024-09-01")
    pdf1 = _events([(i, base + pd.Timedelta(minutes=i), i % 3, "t",
                     float(i), "{}") for i in range(50)])
    pdf2 = pdf1.copy()
    pdf2.loc[10, "value"] = 999.0  # one changed row

    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf1))
    r1 = {r.level: (r.n_nodes, r.level_xor)
          for r in mod.misc_merkle_bucket_tree(spark, "u").collect()}
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf2))
    r2 = {r.level: (r.n_nodes, r.level_xor)
          for r in mod.misc_merkle_bucket_tree(spark, "u").collect()}

    # structure: 256 -> 128 -> ... -> 1
    for k in range(9):
        assert r1[k][0] == 256 >> k
    # a single-row change flips the root (level 8)
    assert r1[8][1] != r2[8][1]
    # identical input -> identical tree (determinism)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf1))
    r1b = {r.level: (r.n_nodes, r.level_xor)
           for r in mod.misc_merkle_bucket_tree(spark, "u").collect()}
    assert r1 == r1b


def test_cohort_ltv_accumulates_exactly(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    base = pd.Timestamp("2024-01-01")  # day 1 -> cohort 0
    rows = [
        # user 1: first seen day 1 (cohort 0), purchases on ages 0 and 2
        (0, base, 1, "signup", 0.0, "{}"),
        (1, base, 1, "purchase", 10.0, "{}"),
        (2, base + pd.Timedelta(days=2), 1, "purchase", 5.5, "{}"),
        # user 2: same cohort, no purchases
        (3, base + pd.Timedelta(days=3), 2, "view", 1.0, "{}"),
        # user 3: day 10 -> cohort 1, one purchase age 1
        (4, base + pd.Timedelta(days=9), 3, "signup", 0.0, "{}"),
        (5, base + pd.Timedelta(days=10), 3, "purchase", 20.0, "{}"),
    ]
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {(r.cohort, r.age): r for r in mod.events_cohort_ltv(spark, "u").collect()}

    r = got[(0, 0)]
    assert (r.n_users, r.rev_cents, r.cum_cents) == (2, 1000, 1000)
    assert r.ltv_cents_per_user == 500
    r = got[(0, 2)]
    assert (r.rev_cents, r.cum_cents, r.ltv_cents_per_user) == (550, 1550, 775)
    r = got[(1, 1)]
    assert (r.n_users, r.cum_cents, r.ltv_cents_per_user) == (1, 2000, 2000)


def test_mmr_rerank_matches_greedy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(73)
    vecs = rng.normal(size=(30, 64)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(30), "embedding": [v.tolist() for v in vecs],
         "label": [0] * 30}
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = [(r.rk, r.vec_id) for r in mod.emb_mmr_rerank(spark, "u").collect()]

    def cos_q9(a, b):
        # mirror the engine's sequential float fold + floor quantization
        dot = 0.0
        na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return math.floor(1e9 * (dot / (math.sqrt(na) * math.sqrt(nb))))

    qs = {i: cos_q9(vecs[i], vecs[0]) for i in range(1, 30)}
    cand = sorted(qs, key=lambda i: (-qs[i], i))[:mod._MMR_CANDS]
    sel = []
    for k in range(mod._MMR_PICKS):
        best = None
        for d_ in cand:
            if d_ in sel:
                continue
            pen = max((cos_q9(vecs[d_], vecs[s]) for s in sel), default=0)
            score = 7 * qs[d_] - 3 * pen if sel else 7 * qs[d_]
            key = (score, -d_)
            if best is None or key > best[0]:
                best = (key, d_)
        sel.append(best[1])
    assert [v for _, v in got] == sel
    assert got[0][1] == max(qs, key=lambda i: (qs[i], -i))  # first = nearest
    assert len(set(v for _, v in got)) == 5  # no repeats


def test_assortativity_matches_numpy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(79)
    rows = []
    ln = 0
    for o in range(100):
        parts = rng.choice(50, size=rng.randint(2, 5), replace=False)
        for p in parts:
            ln += 1
            rows.append((o, int(p), 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         pd.Timestamp("2024-01-01")))
    pdf = pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.graph_assortativity(spark, "u").collect()[0]

    import itertools as it
    eu = set()
    for _, g in pdf.groupby("l_orderkey"):
        for a, b in it.combinations(sorted(set(g["l_partkey"])), 2):
            eu.add((a, b))
    sym = list(eu) + [(b, a) for a, b in eu]
    from collections import Counter
    deg = Counter(u for u, _ in sym)
    xs = np.array([deg[u] for u, _ in sym], dtype=float)
    ys = np.array([deg[v] for _, v in sym], dtype=float)
    expected = np.corrcoef(xs, ys)[0, 1]
    assert r.m == len(sym)
    assert r.assortativity_q6 / 1e6 == pytest.approx(expected, abs=2e-6)


def test_burrows_delta_zscore_arithmetic(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    # three sources with controlled word mixes; 'x' common everywhere,
    # 'y' overused by a, 'z' overused by b; c mirrors a closely.
    docs = {
        "a": "x x x y y y z", "b": "x x x z z z y",
        "c": "x x x y y z z", "d": "x y z x y z x",
    }
    pdf = pd.DataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(docs.items())],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = [(r.src_a, r.src_b, r.n_words, r.delta_q6)
            for r in mod.text_burrows_delta(spark, "u").collect()]

    # brute force with the same integer quantization
    from collections import Counter
    cnts = {s: Counter(t.split()) for s, t in docs.items()}
    words = Counter()
    for c in cnts.values():
        words.update(c)
    top = [w for w, _ in sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:mod._DELTA_TOPW]]
    fq = {}
    for s, c in cnts.items():
        n = sum(c.values())
        for w in top:
            fq[(s, w)] = c.get(w, 0) * 1_000_000 // n
    z = {}
    for w in top:
        vals = [fq[(s, w)] for s in docs]
        k = len(vals)
        s1, s2 = sum(vals), sum(v * v for v in vals)
        var = (k * s2 - s1 * s1) / (k * k)
        if k * s2 - s1 * s1 <= 0:
            continue
        for s in docs:
            z[(s, w)] = math.floor(1e6 * (fq[(s, w)] - s1 / k) / math.sqrt(var))
    import itertools as it
    exp = []
    for a, b in it.combinations(sorted(docs), 2):
        ws = [w for w in top if (a, w) in z and (b, w) in z]
        tot = sum(abs(z[(a, w)] - z[(b, w)]) for w in ws)
        exp.append((a, b, len(ws), tot // len(ws)))
    exp.sort(key=lambda r: (r[3], r[0], r[1]))
    assert rows == exp[:10]
    # a and c (similar mixes) are closer than a and b (opposite mixes)
    d_ac = next(r[3] for r in rows if {r[0], r[1]} == {"a", "c"})
    d_ab = next(r[3] for r in rows if {r[0], r[1]} == {"a", "b"})
    assert d_ac < d_ab


def test_runs_test_alternating_vs_blocked(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    base = pd.Timestamp("2024-10-01")
    rows = []
    eid = 0
    # 'alt': alternating high/low day counts -> many runs, z > 0
    # 'blk': first half high, second half low -> 2 runs, z < 0
    for d in range(20):
        alt_n = 10 if d % 2 == 0 else 2
        blk_n = 10 if d < 10 else 2
        for _ in range(alt_n):
            rows.append((eid, base + pd.Timedelta(days=d, minutes=eid % 60),
                         1, "alt", 1.0, "{}")); eid += 1
        for _ in range(blk_n):
            rows.append((eid, base + pd.Timedelta(days=d, minutes=eid % 60),
                         1, "blk", 1.0, "{}")); eid += 1
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.event_type: r for r in mod.stats_runs_test(spark, "u").collect()}

    assert out["alt"].n_runs == 20  # perfect alternation
    assert out["blk"].n_runs == 2
    assert out["alt"].z_q6 > 0 > out["blk"].z_q6
    assert out["alt"].n1 == 10 and out["alt"].n0 == 10


def test_knn_eval_separable_labels(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(83)
    # two well-separated clusters -> LOO 5-NN should be near-perfect
    vecs, labels = [], []
    for i in range(80):
        lab = i % 2
        center = np.zeros(64)
        center[lab] = 5.0
        vecs.append((center + rng.normal(0, 0.3, 64)).astype(np.float32))
        labels.append(lab)
    pdf = pd.DataFrame({"vec_id": range(80),
                        "embedding": [v.tolist() for v in vecs],
                        "label": labels})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.ml_knn_classifier_eval(spark, "u").collect()
    overall = rows[0].overall_acc_q6
    assert overall >= 950_000  # separable clusters classify correctly
    assert sum(r.n_eval for r in rows) == 50
    for r in rows:
        assert r.acc_q6 == r.n_correct * 1_000_000 // r.n_eval


def test_blocked_linkage_finds_typo_pairs(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    names = ["small ring", "smal ring", "small king", "red widget",
             "rod widget", "blue bolt", "blew bolt", "green gear"]
    pdf = pd.DataFrame({
        "p_partkey": range(len(names)), "p_name": names,
        "p_brand": ["b"] * len(names), "p_type": ["t"] * len(names),
        "p_size": [1] * len(names), "p_retailprice": [1.0] * len(names)})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    out = {r.block: r for r in mod.er_blocked_linkage(spark, "u").collect()}

    # 'small'/'smal' share soundex S540; 'blue'/'blew' share B400
    import itertools as it

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(m[i-1][j] + 1, m[i][j-1] + 1,
                              m[i-1][j-1] + (a[i-1] != b[j-1]))
        return m[len(a)][len(b)]

    s540 = ["small ring", "smal ring", "small king"]
    pairs = list(it.combinations(sorted(s540), 2))
    n_match = sum(1 for a, b in pairs if lev(a, b) <= 3)
    assert out["S540"].n_names == 3
    assert out["S540"].n_pairs == 3
    assert out["S540"].n_matches == n_match == 3
    assert out["B400"].n_matches == 1  # blue bolt ~ blew bolt
    assert out["G650"].n_pairs == 0  # singleton block


def test_fiscal_445_period_fences(spark, monkeypatch):
    from cudf_spark.queries import analytics3 as mod

    dates = {
        # FY2024 starts 2024-02-01
        "2024-02-01": (2024, 1, 1),   # week 0 -> P1
        "2024-02-29": (2024, 1, 2),   # week 4 -> P2
        "2024-03-28": (2024, 1, 3),   # week 8 -> P3
        "2024-04-25": (2024, 2, 4),   # week 12 -> still P3? no: 12 -> P3 fence is w<13
        "2024-01-31": (2023, 4, 12),  # day before FY start -> prior FY tail
        "2025-01-30": (2024, 4, 12),  # week 52 days in -> clamped P12
    }
    # fix the one intentionally tricky row: 2024-04-25 is week 12 -> P3
    dates["2024-04-25"] = (2024, 1, 3)
    rows = [(i, pd.Timestamp(d), "O", 100.0, pd.Timestamp(d), "1-URGENT")
            for i, d in enumerate(dates)]
    pdf = pd.DataFrame(rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"])
    pdf["o_custkey"] = 1
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {}
    for r in mod.dt_fiscal_calendar_445(spark, "u").collect():
        got[(r.fyear, r.quarter, r.period)] = r.n_orders
    from collections import Counter
    exp = Counter(dates.values())
    assert got == dict(exp)


def test_ratio_delta_method_matches_numpy(spark, monkeypatch):
    import numpy as np

    from cudf_spark.queries import analytics3 as mod

    rng = np.random.RandomState(89)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-11-01")
    xs, ys = [], []
    for uid in range(120):
        clicks = int(rng.randint(1, 20))
        purchases = int(rng.randint(0, 4))
        x_cents = 0
        for _ in range(clicks):
            rows.append((eid, base + pd.Timedelta(minutes=eid), uid, "click",
                         1.0, "{}")); eid += 1
        for _ in range(purchases):
            v = float(rng.randint(100, 10000)) / 100.0
            x_cents += round(v * 100)
            rows.append((eid, base + pd.Timedelta(minutes=eid), uid, "purchase",
                         v, "{}")); eid += 1
        xs.append(x_cents)
        ys.append(clicks)
    pdf = _events(rows)
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_ratio_delta_method(spark, "u").collect()[0]

    x, y = np.array(xs, float), np.array(ys, float)
    n = len(x)
    R = x.sum() / y.sum()
    sxx = ((x - x.mean()) ** 2).sum()
    syy = ((y - y.mean()) ** 2).sum()
    sxy = ((x - x.mean()) * (y - y.mean())).sum()
    var = (sxx - 2 * R * sxy + R * R * syy) / (n * y.mean() ** 2)
    assert r.n == n
    assert r.ratio_q6 == math.floor(1e6 * R)
    assert r.se_q6 == pytest.approx(1e6 * math.sqrt(var), abs=2)
