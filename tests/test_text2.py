"""Algorithm tests for BPE (hand-computed merge sequences) and
substring-level duplicate spans (planted duplicates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cudf_spark.operators.substrings import duplicate_spans, kgram_index
from cudf_spark.operators.tokenizers import bpe_tokenize_udf


def _bpe_one(spark, merges, text):
    tok = bpe_tokenize_udf(spark, merges)
    [row] = spark.createDataFrame([(text,)], "text string").select(tok("text").alias("t")).collect()
    return row.t


def test_bpe_merges_in_rank_order(spark):
    # (a,b) has rank 0 so it fires before (ab,c): abcabc -> ab c ab c -> abc abc
    assert _bpe_one(spark, [("a", "b"), ("ab", "c")], "abcabc ab") == ["abc", "abc", "ab"]
    # (b,c) outranks (a,b): abc -> a bc, and (a,b) can no longer apply.
    assert _bpe_one(spark, [("b", "c"), ("a", "b")], "abc") == ["a", "bc"]
    # No applicable merge -> characters survive.
    assert _bpe_one(spark, [("x", "y")], "ab") == ["a", "b"]
    # All occurrences of the winning pair merge in one pass.
    assert _bpe_one(spark, [("a", "a")], "aaaa") == ["aa", "aa"]
    # Case-folding + whitespace tokenization.
    assert _bpe_one(spark, [("t", 'h'), ("th", "e")], "THE the") == ["the", "the"]


def test_kgram_index_short_doc_guard(spark):
    docs = spark.createDataFrame([(1, "abc"), (2, "abcdef")], "id long, text string")
    rows = kgram_index(docs, "id", "text", 5).collect()
    # doc 1 is shorter than k -> no grams (NOT a descending sequence blowup)
    assert {r.id for r in rows} == {2}
    assert [(r.pos, r.gram) for r in rows] == [(1, "abcde"), (2, "bcdef")]


def test_duplicate_spans_planted(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    # Boundary chars deliberately differ between docs — a shared boundary
    # char would (correctly) extend the duplicated span past `shared`.
    docs = spark.createDataFrame(
        [
            (1, "AAAA-" + shared + "+BBBB"),
            (2, "CCCCCC_" + shared + "=DDDD"),
            (3, "nothing in common here at all, certainly not forty characters"),
        ],
        "id long, text string",
    )
    spans = {r.id: (r.span_pos, r.span_len) for r in duplicate_spans(docs, "id", "text", min_length=20).collect()}
    assert 3 not in spans
    # The shared span starts right where `shared` begins in each doc.
    assert spans[1] == (6, len(shared))
    assert spans[2] == (8, len(shared))


def test_duplicate_spans_catches_within_doc_repeats(spark):
    # Reference resolve_duplicates reports self-duplicates: a 32-char run of
    # 'x' contains its 20-gram at 13 overlapping positions -> one maximal
    # span covering the whole run, even with no cross-document match.
    run = "x" * 32
    docs = spark.createDataFrame(
        [(1, run + " padding"), (2, "totally different content with no repeats")],
        "id long, text string",
    )
    spans = {r.id: (r.span_pos, r.span_len) for r in duplicate_spans(docs, "id", "text", min_length=20).collect()}
    assert spans == {1: (1, len(run))}


def test_duplicate_spans_hot_gram_cap(spark):
    # A mega-frequent gram (planted boilerplate) is dropped from anchoring
    # once its occurrence count exceeds max_gram_freq, in BOTH physical
    # shapes; a normal duplicated span is still reported.
    boiler = "B" * 200  # its 20-gram occurs 181x in one doc -> over any small cap
    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique trailing content one"),
            (100, "AAAA-" + shared + "+ZZZZ"),
            (101, "CCCC_" + shared + "=DDDD"),
        ],
        "id long, text string",
    )
    # Uncapped, the boiler run self-duplicates into one giant span.
    uncapped = {
        r.id: (r.span_pos, r.span_len)
        for r in duplicate_spans(docs, "id", "text", min_length=20).collect()
    }
    assert uncapped[1] == (1, len(boiler))
    for skew_safe in (False, True):
        spans = {
            r.id: (r.span_pos, r.span_len)
            for r in duplicate_spans(
                docs, "id", "text", min_length=20, max_gram_freq=50, skew_safe=skew_safe
            ).collect()
        }
        # 181 occurrences > cap=50 -> the boilerplate gram stops anchoring.
        assert 1 not in spans, (skew_safe, spans)
        assert spans[100] == (6, len(shared)), skew_safe
        assert spans[101] == (6, len(shared)), skew_safe
