"""Winnowing fingerprints (daft_spark/operators/winnow.py): selection
guarantee, density, pair mining, and the leakage-safe grouped split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daft_spark.operators.sampling import grouped_split
from daft_spark.operators.winnow import winnow_fingerprints, winnow_similarity


def test_winnow_guarantee_and_density(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (0, base),
        (1, base + " with an extra tail sentence appended here"),
        (2, "completely different content about spark execution engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(df, k=8, w=4)
    rows_ = fps.collect()
    by_doc = {}
    for r in rows_:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # winnowing guarantee: docs sharing a long run share fingerprints
    assert by_doc[0] & by_doc[1]
    # density: far fewer fingerprints than k-grams (~2/(w+1))
    n_grams = len(" ".join(base.split())) - 7
    assert len(by_doc[0]) < n_grams / 2
    # disjoint content: no shared fingerprints with doc 2
    assert not (by_doc[0] & by_doc[2])
    # short docs (no full window) yield nothing
    tiny = spark.createDataFrame([(9, "abcd")], ["doc_id", "text"])
    assert winnow_fingerprints(tiny, k=8, w=4).count() == 0
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=1)


def test_winnow_similarity_pairs(spark):
    a = "spark graft builds a pyspark native analytics engine from scratch"
    rows = [(0, a), (1, a + " with extras"), (2, "unrelated short text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r for r in
           winnow_similarity(df, min_shared=2).collect()}
    assert (0, 1) in out
    assert out[(0, 1)]["jaccard"] > 0.5
    assert (0, 2) not in out and (1, 2) not in out


def test_grouped_split_no_leakage(spark):
    rows = [(i, f"dom{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    s = grouped_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, group_col="source"
    )
    spans = (
        s.groupBy("source")
        .agg(F.count_distinct("split").alias("n"))
        .agg(F.max("n").alias("m"))
        .first()["m"]
    )
    assert spans == 1  # no group straddles splits
    # deterministic: re-run identical
    a = sorted(tuple(r) for r in s.collect())
    b = sorted(tuple(r) for r in grouped_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, group_col="source"
    ).collect())
    assert a == b
