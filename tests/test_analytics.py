"""Targeted tests for the analytics module: the ahash kernel vs an
independent pure-Python reference, degree-oriented triangle counting vs
brute force on planted graphs, and the moment formulas vs pandas."""

from __future__ import annotations

import itertools
import struct

import pytest


# ---------------------------------------------------------------- ahash

def _py_ahash_bits(w: int, h: int, mult: int, base: int) -> str:
    """Independent reference: no numpy, no shared index math beyond the
    spec (NN downsample rows (r*h)//8, cols (c*w)//8; bit = 64*px > sum)."""
    px = [[(base + (rr * w + cc) * mult) % 256 for cc in range(w)] for rr in range(h)]
    resized = [
        px[(r * h) // 8][(c * w) // 8] for r in range(8) for c in range(8)
    ]
    s = sum(resized)
    return "".join("1" if 64 * v > s else "0" for v in resized)


def test_image_ahash_matches_pure_python(spark):
    from cudf_spark.multimodal import fake_image_texture, image_ahash

    params = [(aid, 8 + aid % 3, 8 + aid % 2, 3 + (aid % 7) * 2, (aid * 37) % 256)
              for aid in range(40)]
    rows = [(aid, fake_image_texture(w, h, m, b)) for aid, w, h, m, b in params]
    df = spark.createDataFrame(rows, "asset_id long, data binary")
    got = {r.asset_id: r for r in image_ahash(df).collect()}
    for aid, w, h, m, b in params:
        bits = _py_ahash_bits(w, h, m, b)
        val = int(bits, 2)
        r = got[aid]
        assert r.valid
        assert r.ahash_hex == format(val, "016x")
        signed = val - (1 << 64) if val >= (1 << 63) else val
        assert r.ahash == signed
        for j in range(4):
            assert getattr(r, f"band{j}") == int(bits[16 * j : 16 * j + 16], 2)


def test_image_ahash_rejects_malformed(spark):
    from cudf_spark.multimodal import fake_image_texture, image_ahash

    rows = [
        (1, None),
        (2, b"JUNK" + b"\x00" * 20),
        (3, b"FIMG" + struct.pack(">II", 4, 4) + b"\x00" * 16),  # w<8: no 8x8
        (4, fake_image_texture(9, 8, 5, 7)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, data binary")
    got = {r.asset_id: r.valid for r in image_ahash(df).collect()}
    assert got == {1: False, 2: False, 3: False, 4: True}


def test_banding_finds_every_hamming3_pair():
    """Pigeonhole property the query relies on: any two 64-bit hashes
    within Hamming distance 3 agree exactly on >= 1 of the 4 16-bit bands."""
    import random

    rng = random.Random(7)
    for _ in range(200):
        a = rng.getrandbits(64)
        flips = rng.sample(range(64), rng.randint(0, 3))
        b = a
        for f in flips:
            b ^= 1 << f
        shares = any(
            (a >> (16 * j)) & 0xFFFF == (b >> (16 * j)) & 0xFFFF for j in range(4)
        )
        assert shares


# ------------------------------------------------------ triangle counting

def _plant_lineitem(spark, orders: list[list[int]]):
    rows = [
        (ok, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O")
        for ok, parts in enumerate(orders)
        for i, p in enumerate(parts)
    ]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    )


def _brute_triangles(orders: list[list[int]]) -> dict[int, int]:
    edges = set()
    for parts in orders:
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    nodes = sorted({n for e in edges for n in e})
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.parametrize(
    "orders",
    [
        [[1, 2, 3]],                           # one triangle
        [[1, 2, 3, 4]],                        # K4: 4 triangles, each node in 3
        [[1, 2], [2, 3], [1, 3], [3, 4]],      # triangle + pendant edge
        [[1, 2, 3], [3, 4, 5], [5, 6, 1]],     # triangle chain, no extra closure
        [[i, i + 1] for i in range(6)],        # path: zero triangles
    ],
)
def test_triangle_count_matches_brute_force(spark, tmp_path, orders, monkeypatch):
    from cudf_spark.queries.analytics import graph_triangle_count
    import cudf_spark.queries.analytics as mod

    li = _plant_lineitem(spark, orders)
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    got = {r.node: r.n_triangles for r in graph_triangle_count(spark, "unused").collect()}
    assert got == _brute_triangles(orders)


# ------------------------------------------------------------- moments

def test_skew_kurtosis_matches_pandas(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    vals = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 4, 4, 4, 9]
    pdf = pd.DataFrame({"l_returnflag": ["A"] * len(vals), "l_quantity": [float(v) for v in vals]})
    li = spark.createDataFrame(pdf)
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    row = mod.agg_skew_kurtosis(spark, "unused").collect()[0]
    s = pd.Series(vals, dtype="float64")
    assert row.n == len(vals)
    assert row.skew_g1 == pytest.approx(float(s.skew()), abs=2e-6)
    assert row.kurt_g2 == pytest.approx(float(s.kurt()), abs=2e-6)


def test_skew_kurtosis_degenerate_group_yields_null(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    pdf = pd.DataFrame(
        {"l_returnflag": ["Z"] * 5 + ["S"] * 2, "l_quantity": [7.0] * 5 + [1.0, 2.0]}
    )
    li = spark.createDataFrame(pdf)
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    rows = {r.l_returnflag: r for r in mod.agg_skew_kurtosis(spark, "unused").collect()}
    # zero variance -> NULL, not a divide-by-zero crash
    assert rows["Z"].skew_g1 is None and rows["Z"].kurt_g2 is None
    # n <= 3 -> NULL even with spread
    assert rows["S"].skew_g1 is None and rows["S"].kurt_g2 is None


def test_corr_matrix_matches_pandas(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    pdf = pd.DataFrame(
        {
            "l_quantity": [1.0, 2.0, 3.0, 4.0, 7.0, 2.0],
            "l_extendedprice": [10.01, 19.99, 30.50, 44.00, 70.25, 21.10],
            "l_discount": [0.00, 0.01, 0.02, 0.05, 0.07, 0.01],
        }
    )
    li = spark.createDataFrame(pdf)
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    got = {
        (r.col_x, r.col_y): r.corr_q6
        for r in mod.agg_corr_matrix(spark, "unused").collect()
    }
    ints = pd.DataFrame(
        {
            "quantity": pdf["l_quantity"].astype("int64"),
            "price_cents": (pdf["l_extendedprice"] * 100).round().astype("int64"),
            "discount_pct": (pdf["l_discount"] * 100).round().astype("int64"),
        }
    )
    c = ints.corr()
    for (x, y), v in got.items():
        assert v == pytest.approx(float(c.loc[x, y]), abs=2e-6)


# ------------------------------------------------- batch 2: sequences etc.

def test_business_days_closed_form_matches_numpy():
    """The B(d) cumulative-weekday closed form == np.busday_count on a
    dense grid of (start, end) pairs spanning month/year/weekend edges."""
    import datetime as dt

    import numpy as np

    epoch = dt.date(1970, 1, 5)  # a Monday

    def B(d: dt.date) -> int:
        t = (d - epoch).days
        return (t // 7) * 5 + min(t % 7, 5)

    starts = [dt.date(1996, 12, 25) + dt.timedelta(days=i) for i in range(20)]
    for d1 in starts:
        for span in range(0, 40):
            d2 = d1 + dt.timedelta(days=span)
            got = B(d2) - B(d1)
            want = int(np.busday_count(d1, d2))
            assert got == want, (d1, d2, got, want)


def test_dt_business_days_spark_matches_numpy(spark, monkeypatch):
    import numpy as np
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
            "o_orderdate": pd.to_datetime(["1997-01-03", "1997-06-15", "1999-12-31"]),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3],
            "l_shipdate": pd.to_datetime(
                ["1997-01-10", "1997-02-03", "1997-06-16", "2000-01-04"]
            ),
        }
    )
    tables = {"orders": spark.createDataFrame(orders), "lineitem": spark.createDataFrame(li)}
    monkeypatch.setattr(mod, "load", lambda s, d, n: tables[n])
    got = {r.o_orderpriority: r for r in mod.dt_business_days(spark, "unused").collect()}
    spans = {
        "1-URGENT": [("1997-01-03", "1997-01-10"), ("1997-01-03", "1997-02-03"),
                     ("1997-06-15", "1997-06-16")],
        "2-HIGH": [("1999-12-31", "2000-01-04")],
    }
    for prio, ps in spans.items():
        want = [int(np.busday_count(a, b)) for a, b in ps]
        assert got[prio].min_bdays == min(want)
        assert got[prio].max_bdays == max(want)
        assert got[prio].n == len(want)


def test_autocorr_matches_pandas(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    # 30 consecutive days, revenue with a strong period-7 component
    days = pd.date_range("1997-03-01", periods=30, freq="D")
    rev_cents = [(10_000 + 3_000 * (i % 7) + 137 * i) for i in range(30)]
    li = pd.DataFrame(
        {
            "l_shipdate": days,
            "l_extendedprice": [c / 100.0 for c in rev_cents],
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(li))
    got = {r.lag: r.autocorr_q6 for r in mod.win_autocorr_lag(spark, "unused").collect()}
    s = pd.Series([float(c) for c in rev_cents])
    assert got[1] == pytest.approx(float(s.autocorr(1)), abs=2e-6)
    assert got[7] == pytest.approx(float(s.autocorr(7)), abs=2e-6)
    assert got[7] > got[1]  # the planted weekly period dominates


def test_markov_transitions_rows_normalise(spark, sf_dir=None):
    from cudf_spark.queries.analytics import events_markov_transitions

    df = events_markov_transitions(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert {r.from_type for r in rows} <= {"signup", "click", "error", "view", "purchase"}
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.prob_q6
    for tot in by_from.values():
        assert tot == pytest.approx(1.0, abs=1e-4)


# -------------------------------------------------- batch 3: lpa / dedup

def test_label_propagation_two_cliques(spark, monkeypatch):
    """Two 4-cliques joined by one bridge edge: LPA must converge to two
    communities labelled by each clique's minimum node id."""
    from cudf_spark.queries import analytics as mod

    orders = [[1, 2, 3, 4], [10, 11, 12, 13], [4, 10]]
    li = _plant_lineitem(spark, orders)
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    got = {r.node: r.community for r in mod.graph_label_propagation(spark, "u").collect()}
    assert set(got) == {1, 2, 3, 4, 10, 11, 12, 13}
    # within each clique the dominant neighbour label wins; the bridge
    # cannot outvote three clique neighbours
    assert len({got[n] for n in (1, 2, 3)}) == 1
    assert len({got[n] for n in (11, 12, 13)}) == 1
    assert got[1] != got[11]


def test_minhash_incremental_planted_neardup(spark, monkeypatch):
    """A new doc that is a near-copy of a prior doc is flagged with that
    prior doc as its best match; a novel new doc is not flagged."""
    from cudf_spark.queries import analytics as mod

    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    rows = [
        (1, base, "en", "src0", len(base)),
        (2, "completely different text about spark physics and parquet files here", "en", "src1", 60),
        (100, base + " tonight", "en", "src3", len(base) + 8),   # near-copy of 1
        (101, "nothing shares shingles with anything else at all zzz qqq www eee rrr", "en", "src3", 60),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(mod, "load", lambda s, dd, n: d)
    got = {r.doc_id: r for r in mod.dedup_minhash_incremental(spark, "u").collect()}
    assert set(got) == {100, 101}
    assert got[100].is_neardup and got[100].match_id == 1
    assert got[100].jaccard_q6 >= 0.2
    assert not got[101].is_neardup and got[101].match_id is None


def test_video_signature_groups_identical_videos(spark, monkeypatch):
    """doc_ids congruent mod 24 with equal n_chars%5 produce byte-identical
    fake videos -> one dup group keyed by the smallest id."""
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    pdf = pd.DataFrame({
        "doc_id": [5, 29, 53, 7],          # 5,29,53 ≡ 5 (mod 24); 7 distinct
        "n_chars": [10, 15, 20, 10],        # all %5 == 0 for the first three
    })
    d = spark.createDataFrame(pdf)
    monkeypatch.setattr(mod, "load", lambda s, dd, n: d)
    rows = mod.mm_video_dedup_signature(spark, "u").collect()
    assert len(rows) == 1
    assert rows[0].n_copies == 3 and rows[0].canonical_id == 5


# ------------------------------------------- batch 4: describe / cumprod

def test_describe_matches_pandas(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    pdf = pd.DataFrame(
        {
            "l_quantity": [1.0, 5.0, 2.0, 8.0, 3.0, 13.0, 21.0],
            "l_extendedprice": [10.00, 52.25, 19.10, 80.75, 33.33, 130.01, 210.99],
            "l_discount": [0.00, 0.05, 0.02, 0.08, 0.03, 0.10, 0.01],
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {(r.col, r.stat): r.value for r in mod.agg_describe(spark, "u").collect()}
    ints = pd.DataFrame(
        {
            "quantity": pdf["l_quantity"].astype("int64"),
            "price_cents": (pdf["l_extendedprice"] * 100).round().astype("int64"),
            "discount_pct": (pdf["l_discount"] * 100).round().astype("int64"),
        }
    )
    desc = ints.describe()
    remap = {"count": "count", "mean": "mean", "std": "std", "min": "min",
             "25%": "q25", "50%": "q50", "75%": "q75", "max": "max"}
    for col in ints.columns:
        for prow, stat in remap.items():
            assert got[(col, stat)] == pytest.approx(
                float(desc.loc[prow, col]), abs=2e-6
            ), (col, stat)


def test_cumprod_matches_python_fold(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    # order 1: unique line numbers; order 2: TIED line numbers (the fixture
    # reality) — the RANGE frame must include all peers, making the value
    # well-defined under any tie order
    pdf = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 2],
            "l_linenumber": [1, 2, 3, 1, 1, 2],
            "l_discount": [0.02, 0.05, 0.00, 0.03, 0.07, 0.10],
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.scan_cumprod(spark, "u").collect()
    got = [(r.l_orderkey, r.l_linenumber, r.cumprod_scaled) for r in rows]
    # order 1: 3, 3*6=18, 18*1=18 ; order 2 peers at line 1: 4*8=32 for BOTH
    assert got == [
        (1, 1, 3), (1, 2, 18), (1, 3, 18),
        (2, 1, 32), (2, 1, 32), (2, 2, 32 * 11),
    ]


def test_pivot_multi_consistency(spark):
    from cudf_spark.queries.analytics import reshape_pivot_multi

    rows = reshape_pivot_multi(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3
    for r in rows:
        # counts are non-negative and a present qty implies a positive count
        for qty, cnt in ((r.f_qty, r.f_cnt), (r.o_qty, r.o_cnt)):
            if qty is not None:
                assert cnt > 0


# --------------------------------- batch 5: rolling quantile / entropy

def test_rolling_quantile_matches_pandas(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    rng = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0, 11.0, 0.0]
    pdf = pd.DataFrame(
        {
            "l_suppkey": [1] * len(rng),
            "l_orderkey": list(range(len(rng))),
            "l_linenumber": [1] * len(rng),
            "l_partkey": list(range(len(rng))),
            "l_shipdate": pd.to_datetime(["1997-01-01"] * len(rng))
            + pd.to_timedelta(list(range(len(rng))), unit="D"),
            "l_quantity": rng,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {
        r.l_orderkey: r.p90_q6
        for r in mod.win_rolling_quantile(spark, "u").collect()
    }
    want = pd.Series(rng).rolling(10, min_periods=4).quantile(0.9, interpolation="linear")
    for i in range(len(rng)):
        if pd.isna(want[i]):
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(float(want[i]), abs=2e-6), i


def test_entropy_gini_planted(spark, monkeypatch):
    import math

    import pandas as pd

    from cudf_spark.queries import analytics as mod

    # one weekday, known mix: 4 clicks, 2 views, 2 errors -> p = .5,.25,.25
    ts = pd.to_datetime(["1997-01-06 10:00:00"] * 8)  # a Monday
    pdf = pd.DataFrame(
        {
            "event_id": range(8),
            "ts": ts,
            "user_id": [1] * 8,
            "event_type": ["click"] * 4 + ["view"] * 2 + ["error"] * 2,
            "value": [1.0] * 8,
            "props": ["{}"] * 8,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.agg_entropy_gini(spark, "u").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.dow == 2 and r.n == 8 and r.n_types == 3
    want_entropy = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))  # 1.5 bits
    want_gini = 1 - (0.25 + 0.0625 + 0.0625)
    assert r.entropy_bits_q6 == pytest.approx(want_entropy, abs=2e-6)
    assert r.gini_q6 == pytest.approx(want_gini, abs=2e-6)


def test_stream_image_dedup_matches_batch_rule(spark):
    """The incremental stream's end state equals the one-shot keep-first
    rule computed directly in Spark."""
    from cudf_spark.multimodal import image_ahash
    from cudf_spark.queries import analytics as mod

    sf = "/root/testdata/sf0.001"
    got = {r.nibble: (r.n_kept, r.id_sum)
           for r in mod.stream_image_dedup_incremental(spark, sf).collect()}
    d = mod.load(spark, sf, "documents").select("doc_id")
    hashed = image_ahash(mod._encode_textured_images(d)).filter("valid")
    import pyspark.sql.functions as F
    want = {
        r.nibble: (r.n_kept, r.id_sum)
        for r in hashed.groupBy("ahash_hex")
        .agg(F.min("asset_id").alias("asset_id"))
        .groupBy(F.substring("ahash_hex", 1, 1).alias("nibble"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
             F.sum("asset_id").cast("bigint").alias("id_sum"))
        .collect()
    }
    assert got == want


# ------------------------------ batch 6: truncation recall / rouge

def test_truncated_recall_planted(spark, monkeypatch):
    """Planted vectors where the 2-dim prefix inverts the full-dim ranking:
    the query (vec 7) has full-dim top-1 = vec 1, but vec 2 wins on the
    prefix — recall@10 still counts overlap of the full sets."""
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    def vec(prefix16, tail48):
        return [float(x) for x in prefix16] + [float(tail48)] * 48

    rows = []
    # query id 7 (7 % 101 == 7)
    rows.append((7, vec([1.0] * 16, 1.0), 0))
    for i, tail in [(1, 1.0), (2, 0.0), (3, -1.0)]:
        rows.append((i, vec([1.0] * 16, tail if i != 2 else 1.0), 0))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = mod.emb_truncated_dim_recall(spark, "u").collect()
    assert len(got) == 1
    r = got[0]
    assert r.qid == 7
    # only 3 corpus vectors -> both top-10 sets are all 3 -> full overlap
    assert r.n_overlap == 3
    assert 0 <= r.recall_uu <= 1_000_000


def test_eval_ngram_overlap_planted(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    docs = [
        (1, "the cat sat on the mat", "s0"),
        (2, "the cat sat on a rug", "s0"),   # shares 'the cat','cat sat','sat on'
        (3, "zzz yyy xxx", "s0"),             # shares nothing with doc 2
        (9, "solo document here", "s1"),      # no successor -> no row
    ]
    pdf = pd.DataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.doc_id: r for r in mod.eval_ngram_overlap(spark, "u").collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1.ref_id == 2 and r1.n_common == 3
    # doc1 has 5 distinct bigrams, doc2 has 5
    assert r1.rouge2_precision == pytest.approx(3 / 5, abs=1e-6)
    assert r1.rouge2_recall == pytest.approx(3 / 5, abs=1e-6)
    assert got[2].n_common == 0


# ----------------------------------- batch 7: stats / drawdown

def test_welch_t_matches_reference(spark, monkeypatch):
    import math

    import pandas as pd

    from cudf_spark.queries import analytics as mod

    a_vals = [10.5, 12.0, 9.75, 11.25, 10.0, 13.5]
    b_vals = [20.0, 18.25, 22.5, 19.75]
    rows = [("click", v) for v in a_vals] + [("purchase", v) for v in b_vals]
    pdf = pd.DataFrame(
        [(i, pd.Timestamp("1997-01-01"), 1, t, v, "{}") for i, (t, v) in enumerate(rows)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_ab_welch_t(spark, "u").collect()[0]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    na, ma, va = mv(a_vals)
    nb, mb, vb = mv(b_vals)
    sa2, sb2 = va / na, vb / nb
    t = (ma - mb) / math.sqrt(sa2 + sb2)
    df = (sa2 + sb2) ** 2 / (sa2**2 / (na - 1) + sb2**2 / (nb - 1))
    assert r.n_a == na and r.n_b == nb
    assert r.mean_a == pytest.approx(ma, abs=2e-6)
    assert r.t_stat == pytest.approx(t, abs=2e-5)
    assert r.welch_df == pytest.approx(df, abs=2e-3)


def test_chi_square_matches_reference(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    # 2 weekdays x 2 types with a planted association
    counts = {("1997-01-05", "click"): 30, ("1997-01-05", "view"): 10,
              ("1997-01-06", "click"): 10, ("1997-01-06", "view"): 30}
    recs = []
    i = 0
    for (day, typ), c in counts.items():
        for _ in range(c):
            recs.append((i, pd.Timestamp(day + " 12:00:00"), 1, typ, 1.0, "{}"))
            i += 1
    pdf = pd.DataFrame(
        recs, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_chi_square(spark, "u").collect()[0]
    # manual chi2: rows 40/40, cols 40/40, n=80 -> e=20 each, (10)^2/20 *4 = 20
    assert r.n == 80 and r.n_cells == 4
    assert r.chi2_q6 == pytest.approx(20.0, abs=1e-6)


def test_max_drawdown_matches_python(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    revs = [100.0, -40.0, 30.0, -80.0, 10.0, 200.0, -50.0]
    days = pd.date_range("1997-05-01", periods=len(revs), freq="D")
    pdf = pd.DataFrame({"l_shipdate": days, "l_extendedprice": revs})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.win_max_drawdown(spark, "u").collect()[0]
    cents = [int(round(v * 100)) for v in revs]
    cum = peak = 0
    best = 0
    trough = None
    for d, c in zip(days, cents):
        cum += c
        peak = max(peak, cum)
        gap = peak - cum
        if gap > best:
            best, trough = gap, d.date()
    assert r.n_days == len(revs)
    assert r.max_drawdown_cents == best
    assert r.trough_day == trough


def test_bootstrap_ci_brackets_point_mean(spark):
    """Poisson-bootstrap CI must bracket the point mean and be reproducible
    run-to-run (hash-derived multiplicities, no RNG state)."""
    from cudf_spark.queries.analytics import stats_bootstrap_ci_poisson

    sf = "/root/testdata/sf0.001"
    r1 = stats_bootstrap_ci_poisson(spark, sf).collect()[0]
    r2 = stats_bootstrap_ci_poisson(spark, sf).collect()[0]
    assert r1 == r2
    assert r1.n_replicates == 50
    assert r1.ci_lo <= r1.point_mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi


# --------------------------------- batch 9: dq suite / feature windows

def test_dq_suite_flags_planted_violations(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 99],       # 99 -> FK violation
            "l_linenumber": [1, 2, 1, 1],
            "l_quantity": [5.0, 99.0, 3.0, 1.0],   # 99 out of range
            "l_extendedprice": [10.0, 20.0, -5.0, 30.0],  # -5 not positive
            "l_discount": [0.05, 0.2, 0.01, 0.0],  # 0.2 out of range
            "l_shipdate": pd.to_datetime(
                ["1997-01-10", "1997-01-11", "1996-12-30", "1997-02-01"]
            ),
        }
    )
    o = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 2],           # duplicate pk 2
            "o_orderdate": pd.to_datetime(["1997-01-01", "1997-01-01", "1997-01-01"]),
        }
    )
    tables = {"lineitem": spark.createDataFrame(li), "orders": spark.createDataFrame(o)}
    monkeypatch.setattr(mod, "load", lambda s, d, n: tables[n])
    got = {r.check_name: r for r in mod.dq_constraint_suite(spark, "u").collect()}
    assert got["li_quantity_in_range"].n_violations == 1
    assert got["li_discount_in_range"].n_violations == 1
    assert got["li_price_positive"].n_violations == 1
    assert got["li_orderkey_fk"].n_violations == 1
    assert got["o_orderkey_unique"].n_violations == 1
    # order 2 duplicated in o -> lineitem row for order 2 joins twice, both
    # with shipdate 1996-12-30 < orderdate -> 2 temporal violations
    assert got["li_ship_after_order"].n_violations == 2
    assert not got["li_orderkey_fk"].passed
    assert got["li_orderkey_complete"].passed


def test_feat_multi_horizon_single_window_node(spark):
    """Both horizons must come out of ONE Window operator (one user-keyed
    exchange), not one per frame."""
    from cudf_spark.queries.analytics import feat_multi_horizon

    plan = feat_multi_horizon(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") - plan.count("WindowGroupLimit") == 1, plan


# --------------------------- batch 10: weighted median / rfm / negatives

def test_weighted_median_matches_reference(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    xs = [1, 3, 3, 7, 9]
    ws = [1.00, 0.50, 0.50, 0.25, 0.25]  # dollars -> cents weights
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * len(xs),
            "l_quantity": [float(x) for x in xs],
            "l_extendedprice": ws,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.agg_weighted_median(spark, "u").collect()[0]

    # lower weighted median by definition: smallest x with 2*cum >= total
    items = sorted(zip(xs, [int(round(w * 100)) for w in ws]))
    tot = sum(w for _, w in items)
    cum = 0
    want = None
    for x, w in items:
        cum += w
        if 2 * cum >= tot:
            want = x
            break
    assert r.wmedian == want and r.total_weight == tot


def test_rfm_scores_quintile_semantics(spark):
    from cudf_spark.queries.analytics import events_rfm_scores

    rows = events_rfm_scores(spark, "/root/testdata/sf0.001").collect()
    assert rows, "purchase events must produce segments"
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.n_users > 0


def test_negative_sampling_dense_ids_and_determinism(spark):
    from cudf_spark.catalog import load
    from cudf_spark.queries.analytics import pipeline_negative_sampling

    sf = "/root/testdata/sf0.001"
    # the query's resolve join relies on dense 0..N-1 doc ids — assert it
    import pyspark.sql.functions as F
    d = load(spark, sf, "documents")
    n, mx, mn = d.agg(F.count("*"), F.max("doc_id"), F.min("doc_id")).collect()[0]
    assert (mn, mx) == (0, n - 1), "fixture doc_ids must be dense 0..N-1"

    r1 = pipeline_negative_sampling(spark, sf).collect()
    r2 = pipeline_negative_sampling(spark, sf).collect()
    assert r1 == r2                       # hash-derived, no RNG state
    per_anchor = {}
    for r in r1:
        per_anchor.setdefault(r.anchor_id, set()).add(r.k)
    assert all(ks == {0, 1, 2, 3} for ks in per_anchor.values())


# ----------------------------- batch 11: mann-whitney / stream dq

def test_mann_whitney_matches_brute_force(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    a_vals = [1, 2, 2, 5, 7]
    b_vals = [2, 3, 3, 8]
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * len(a_vals) + ["N"] * len(b_vals),
            "l_quantity": [float(v) for v in a_vals + b_vals],
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_mann_whitney_u(spark, "u").collect()[0]
    u = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a in a_vals for b in b_vals
    )
    assert r.n_a == len(a_vals) and r.n_b == len(b_vals)
    assert r.u_stat == pytest.approx(u, abs=1e-9)
    assert r.auc_q6 == pytest.approx(u / (len(a_vals) * len(b_vals)), abs=2e-6)


def test_stream_dq_monitor_matches_batch_counts(spark):
    from cudf_spark.catalog import load
    from cudf_spark.queries.analytics import stream_dq_monitor

    import pyspark.sql.functions as F
    sf = "/root/testdata/sf0.001"
    got = {r.check_name: r for r in stream_dq_monitor(spark, sf).collect()}
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 30000)
    n = li.count()
    for r in got.values():
        assert r.n_checked == n
        assert r.n_batches == 3


# ------------------------------ batch 12: ks test / attribution

def test_ks_test_matches_reference(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    a_vals = [1, 1, 2, 3, 5, 5, 5]
    b_vals = [2, 3, 3, 4, 6]
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * len(a_vals) + ["N"] * len(b_vals),
            "l_quantity": [float(v) for v in a_vals + b_vals],
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.stats_ks_test(spark, "u").collect()[0]
    support = sorted(set(a_vals + b_vals))
    d = max(
        abs(
            sum(1 for a in a_vals if a <= x) / len(a_vals)
            - sum(1 for b in b_vals if b <= x) / len(b_vals)
        )
        for x in support
    )
    assert r.n_a == len(a_vals) and r.n_b == len(b_vals)
    assert r.ks_d_q6 == pytest.approx(d, abs=2e-6)


def test_attribution_splits_exactly(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    rows = [
        # user 1: 2 touches strictly inside the 7d lookback, 1 exactly ON
        # the boundary (excluded: the window is (pts-7d, pts]), 1 far
        # outside; purchase of 10.000001
        (1, "1997-01-01 00:00:00", 1, "click", 0.0),   # == pts-7d: excluded
        (2, "1997-01-05 00:00:00", 1, "view", 0.0),
        (3, "1997-01-07 00:00:00", 1, "click", 0.0),
        (4, "1996-12-20 00:00:00", 1, "click", 0.0),   # outside lookback
        (5, "1997-01-08 00:00:00", 1, "purchase", 10.000001),
        # user 2: purchase with no preceding touches -> unattributed
        (6, "1997-02-01 00:00:00", 2, "purchase", 5.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.purchase_id: r for r in mod.events_attribution_linear(spark, "u").collect()}
    assert set(got) == {5}                      # unattributed purchases absent
    r = got[5]
    assert r.n_touches == 2
    assert r.revenue_uu == 10_000_001
    assert r.credit_uu == 5_000_000 and r.remainder_uu == 1
    assert r.credit_uu * r.n_touches + r.remainder_uu == r.revenue_uu


# -------------------------- batch 13: degree stats / lorenz

def test_degree_stats_ccdf_invariants(spark, monkeypatch):
    from cudf_spark.queries import analytics as mod

    orders = [[1, 2, 3], [3, 4], [4, 5], [1, 4]]
    li = _plant_lineitem(spark, orders)
    monkeypatch.setattr(mod, "load", lambda s, d, n: li)
    rows = mod.graph_degree_stats(spark, "u").collect()
    # edges: (1,2)(1,3)(2,3)(3,4)(4,5)(1,4) -> degs: 1:3 2:2 3:3 4:3 5:1
    got = {r.degree: (r.n_nodes, r.n_nodes_ge) for r in rows}
    assert got == {1: (1, 5), 2: (1, 4), 3: (3, 3)}
    # ccdf is non-increasing in degree and tops out at |nodes|
    degs = sorted(got)
    for a, b in zip(degs, degs[1:]):
        assert got[a][1] >= got[b][1]


def test_lorenz_curve_monotone_and_exact(spark):
    from cudf_spark.queries.analytics import agg_lorenz_curve_binned

    rows = agg_lorenz_curve_binned(spark, "/root/testdata/sf0.001").collect()
    assert 1 <= len(rows) <= 10
    shares = [r.cum_share_micros for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    # exact integer micro-units: the last cumulative share IS the total
    assert shares[-1] == 1000000
    # equi-depth rank rule: bin sizes differ by at most 1
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # higher bins hold at least their proportional share (Lorenz convexity
    # on value-ordered bins): last bin's mean revenue >= first bin's
    assert (rows[-1].revenue_cents / rows[-1].n_customers
            >= rows[0].revenue_cents / rows[0].n_customers)


# -------------------------- batch 14: pit lookup / centroid drift

def test_pit_lookup_each_fact_matches_one_version(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    part = pd.DataFrame(
        {"p_partkey": [3, 4], "p_retailprice": [10.00, 20.00]}  # 3 re-priced
    )
    li = pd.DataFrame(
        {
            "l_partkey": [3, 3, 3, 4],
            "l_shipdate": pd.to_datetime(
                # before cut, ON the cut (belongs to v2: half-open), after
                ["1996-12-31", "1997-01-01", "1998-06-01", "1998-06-01"]
            ),
            "l_quantity": [1.0, 2.0, 3.0, 4.0],
        }
    )
    tables = {"part": spark.createDataFrame(part), "lineitem": spark.createDataFrame(li)}
    monkeypatch.setattr(mod, "load", lambda s, d, n: tables[n])
    got = {r.price_version: r for r in mod.join_scd2_pit_lookup(spark, "u").collect()}
    # v1: part3 @1000c x1 + part4 @2000c x4 ; v2: part3 @1500c x (2+3)
    assert got[1].n_lineitems == 2 and got[1].priced_cents == 1000 * 1 + 2000 * 4
    assert got[2].n_lineitems == 2 and got[2].priced_cents == 1500 * 5
    # total rows attributed == total facts (no drops, no double counting)
    assert got[1].n_lineitems + got[2].n_lineitems == len(li)


def test_centroid_drift_identical_halves_give_cos_1(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    vec = [float(i % 7 - 3) for i in range(64)]
    rows = [(i, vec, 1) for i in range(4)]          # all identical -> cos 1
    rows += [(10 + i, [float(1 if j == i else 0) for j in range(64)], 2)
             for i in range(4)]                      # orthogonal-ish mix
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    got = {r.label: r for r in mod.emb_centroid_drift(spark, "u").collect()}
    assert got[1].drift_cos_q6 == pytest.approx(1.0, abs=1e-6)
    assert got[1].n_a == 2 and got[1].n_b == 2
    assert got[2].drift_cos_q6 < 1.0


def test_median_of_means_robust_to_outlier(spark, monkeypatch):
    """One absurd outlier wrecks the plain mean but not the MoM estimate."""
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    n = 900
    prices = [10.0] * n
    prices[0] = 10_000_000.0  # the corrupt record
    pdf = pd.DataFrame(
        {
            "l_orderkey": list(range(n)),
            "l_linenumber": [1] * n,
            "l_partkey": list(range(n)),
            "l_extendedprice": prices,
        }
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n_: spark.createDataFrame(pdf))
    r = mod.agg_median_of_means(spark, "u").collect()[0]
    assert r.k == 9 and r.n_total == n
    assert abs(r.mom_dollars_q6 - 10.0) < 1.0       # robust
    assert r.plain_mean_q6 > 1000.0                  # wrecked


# ------------------------- batch 15: hodges-lehmann / extractive

def test_hodges_lehmann_matches_brute_force(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    vals = [1, 2, 2, 3, 9, 9, 9, 40]
    pdf = pd.DataFrame({"l_quantity": [float(v) for v in vals]})
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    r = mod.agg_hodges_lehmann(spark, "u").collect()[0]
    walsh = sorted(
        (vals[i] + vals[j]) / 2
        for i in range(len(vals))
        for j in range(i, len(vals))
    )
    assert r.n_walsh_pairs == len(walsh)
    # lower weighted median of the Walsh multiset
    k = len(walsh)
    want = walsh[(k - 1) // 2] if k % 2 == 1 else walsh[k // 2 - 1]
    assert r.hl_estimate == pytest.approx(want, abs=1e-9)


def test_extractive_degree_picks_hub_sentence(spark, monkeypatch):
    import pandas as pd

    from cudf_spark.queries import analytics as mod

    # sentence 2 shares >=2 tokens with both 1 and 3; 1 and 3 share none
    text = (
        "alpha beta gamma. "
        "alpha beta delta epsilon zeta. "
        "delta epsilon omega."
    )
    pdf = pd.DataFrame(
        [(1, text, "en", "s0", len(text))],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    monkeypatch.setattr(mod, "load", lambda s, d, n: spark.createDataFrame(pdf))
    rows = mod.text_extractive_degree(spark, "u").collect()
    assert len(rows) == 1
    assert rows[0].sid == 2 and rows[0].degree == 2
    assert rows[0].summary == "alpha beta delta epsilon zeta"
