"""Subword tokenizers — the nvtext vocabulary-tokenize surface
(nvtext/wordpiece_tokenize.hpp:106, byte_pair_encoding.hpp:121,
tokenize.hpp tokenize_with_vocabulary) as Arrow-batched Pandas UDFs with a
broadcast vocabulary.

This is the canonical "slow path done right" operator: the vocab ships
once per executor via a broadcast variable (not per-task pickling), the
text crosses the JVM boundary in Arrow batches, and the algorithm is pure
per-row so it scales embarrassingly with partitions. Swap the toy greedy
matcher for a real HF/tiktoken vocab without touching the Spark plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def wordpiece_tokenize_udf(spark: SparkSession, vocab: list[str], unk: str = "[UNK]"):
    """Returns a pandas_udf: text -> array<string> of wordpiece tokens.

    Greedy longest-match-first within each whitespace word; continuation
    pieces use the '##' convention. Deterministic given the vocab.
    """
    bc = spark.sparkContext.broadcast((set(vocab), max((len(v) for v in vocab), default=1)))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tok(texts):
        import pandas as pd

        vocab_set, max_len = bc.value

        def piece(word: str) -> list[str]:
            out, i = [], 0
            while i < len(word):
                end = min(len(word), i + max_len)
                found = None
                while end > i:
                    cand = word[i:end] if i == 0 else "##" + word[i:end]
                    if cand in vocab_set:
                        found = cand
                        break
                    end -= 1
                if found is None:
                    return [unk]
                out.append(found)
                i = end
            return out

        return pd.Series([[p for w in (t or "").lower().split() for p in piece(w)] for t in texts])

    return tok


def wordpiece_tokenize(
    df: DataFrame, spark: SparkSession, text_col: str, vocab: list[str], out_col: str = "pieces"
) -> DataFrame:
    tok = wordpiece_tokenize_udf(spark, vocab)
    return df.withColumn(out_col, tok(F.col(text_col)))
