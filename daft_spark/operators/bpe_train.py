"""Distributed BPE-merge TRAINING (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
vocabulary-construction stage of a tokenizer pipeline, expressed
Spark-first. The engine already SERVES file-BPE vocabularies
(functions/text.py tokenize_encode); this learns the merge table from
the corpus itself.

Algorithm (the published one, unchanged): collapse the corpus to a
(word, freq) table once; each round, count adjacent symbol pairs
weighted by word frequency, take the single most frequent pair
(deterministic lexicographic tiebreak), and merge that pair inside
every word's symbol sequence; repeat for ``num_merges`` rounds.

100 TB posture: the ONLY corpus-scale job is the initial word count
(one map-side-combining groupBy over in-row regexp tokens). Every
training round then runs on the distinct-word table — orders of
magnitude smaller (Heaps' law) and it shrinks further as merges fuse
symbols. Per round: one in-row posexplode to weighted pairs, one
map-side-combined count, ONE driver-side top-1 row (a scalar, the
same shape as any iterative driver loop), and an in-row pair-fusion
projection; the word table's lineage is truncated per round
(localCheckpoint — the connected_components / ivf_train discipline).
No Python in the pair counting; the fusion step is one Arrow-batched
pandas UDF over the word table only (never the corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_apply_merges", "char_split"]


def char_split(col):
    """Single-character symbol array. Spark's split keeps a trailing
    empty element for the (?!^) every-position pattern (limit=-1
    semantics) — filter it, or the empty string becomes a learnable
    'symbol' and wins merge ties ('' sorts first)."""
    return F.filter(F.split(col, "(?!^)"), lambda x: x != "")


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    from daft_spark.operators.dedup import tokens_of

    return (
        df.select(F.explode(tokens_of(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency —
    in-row zip of the symbol array with its own tail, then one
    map-side-combining sum."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.zip_with(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            F.slice(F.col("syms"), 2, F.size("syms") - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    ex = words.select("freq", F.explode(pairs).alias("p"))
    return ex.groupBy("p").agg(F.sum("freq").alias("cnt"))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    (merges in application order, the final (word, freq, syms)
    table). Symbols start as single characters (word-internal BPE,
    no cross-word merges — the Sennrich formulation); the argmax
    pair each round breaks ties lexicographically, so training is a
    pure deterministic function of the corpus."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    wf = _word_freq(df, text_col)
    words = wf.select(
        "word", "freq", char_split(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        words = _merge_pair(words, a, b).localCheckpoint(eager=True)
    return merges, words


def _merge_pair(words: DataFrame, a: str, b: str) -> DataFrame:
    """Fuse every non-overlapping left-to-right occurrence of the
    adjacent pair (a, b) in each word's symbol array — the BPE merge
    application rule. Array scans are inherently sequential per word,
    so this is one Arrow-batched pandas UDF over the (small) word
    table; the corpus is never touched."""
    @F.pandas_udf("array<string>")
    def fuse(syms: pd.Series) -> pd.Series:
        def one(s):
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return words.select("word", "freq", fuse(F.col("syms")).alias("syms"))


def bpe_apply_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list to a (word, freq, syms) table in
    training order — the serving-side re-tokenization used to verify
    a vocabulary (and the bridge to the file-BPE encoder: emitting
    merges as ranks yields a tiktoken-style table)."""
    out = words
    for a, b in merges:
        out = _merge_pair(out, a, b)
    return out
