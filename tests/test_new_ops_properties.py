"""Deterministic randomized property tests for the round-14 operators:
seeded python-generated corpora, one Spark round-trip per property —
the invariants an adversarial fuzz pass would check, kept fast."""

import datetime as dt
import random

import pytest


def _corpus(seed, n=40, n_templates=8):
    """Template corpus with duplication — the shape dedup ops see."""
    rng = random.Random(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    templates = [
        " ".join(rng.choices(words, k=rng.randint(6, 14)))
        for _ in range(n_templates)
    ]
    rows = []
    for i in range(n):
        t = rng.choice(templates)
        if rng.random() < 0.3:  # mutate into a near-dup
            t = t + " " + rng.choice(words)
        rows.append((i, f"s{i % 3}", t))
    return rows


def test_threshold_sweep_monotone(spark):
    """removal_rate is non-increasing in threshold and bounded."""
    from daft_spark.operators.winnow import winnow_threshold_sweep

    df = spark.createDataFrame(
        _corpus(7), "doc_id long, source string, text string"
    )
    rows = sorted(
        winnow_threshold_sweep(df, [0.3, 0.5, 0.7, 0.9]).collect(),
        key=lambda r: r["threshold"],
    )
    assert all(r["n_total"] == 40 for r in rows)
    assert all(0 <= r["n_removed"] <= r["n_total"] for r in rows)
    assert all(r["n_kept"] == r["n_total"] - r["n_removed"] for r in rows)
    rates = [r["removal_rate"] for r in rows]
    assert rates == sorted(rates, reverse=True)


def test_source_overlap_invariants(spark):
    """containment >= jaccard, shared bounded by both sides, at most
    S*(S-1)/2 matrix rows."""
    from daft_spark.operators.winnow import source_overlap_matrix

    df = spark.createDataFrame(
        _corpus(11), "doc_id long, source string, text string"
    )
    rows = source_overlap_matrix(df).collect()
    assert len(rows) <= 3  # 3 sources -> at most 3 unordered pairs
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["shared_fps"] <= min(r["fps_a"], r["fps_b"])
        assert r["containment"] >= r["jaccard"] > 0
        assert r["containment"] <= 1.0


def test_novelty_invariants(spark):
    """Novelty in [0, 1]; the earliest fingerprintable doc is fully
    novel; doc counts never exceed the corpus."""
    from daft_spark.operators.winnow import novelty_report

    df = spark.createDataFrame(
        _corpus(23), "doc_id long, source string, text string"
    )
    rows = novelty_report(df).collect()
    assert sum(r["n_docs"] for r in rows) <= 40
    for r in rows:
        assert 0.0 <= r["avg_novelty"] <= 1.0
        assert 0 <= r["n_fully_novel"] <= r["n_docs"]
        assert 0 <= r["n_fully_stale"] <= r["n_docs"]
    assert sum(r["n_fully_novel"] for r in rows) >= 1


@pytest.mark.parametrize("n_shards", [1, 7])
def test_shard_manifest_conservation(spark, n_shards):
    """Every doc lands in exactly one shard regardless of n_shards;
    token shares sum to 1."""
    from daft_spark.operators.sampling import shard_manifest

    df = spark.createDataFrame(
        _corpus(31), "doc_id long, source string, text string"
    )
    rows = shard_manifest(df, "text", "doc_id", n_shards=n_shards).collect()
    assert sum(r["n_docs"] for r in rows) == 40
    assert all(0 <= r["shard"] < n_shards for r in rows)
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-5


def test_vocab_growth_monotone(spark):
    """Docs, tokens, and vocabulary are non-decreasing in the prefix
    fraction; the full-corpus row sees the whole vocabulary."""
    from daft_spark.operators.repetition import vocab_growth

    df = spark.createDataFrame(
        _corpus(43), "doc_id long, source string, text string"
    ).select("doc_id", "text")
    rows = sorted(vocab_growth(df).collect(), key=lambda r: r["fraction"])
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_tokens"] <= b["n_tokens"]
        assert a["n_vocab"] <= b["n_vocab"]
    assert rows[-1]["n_docs"] == 40
    distinct = len({
        w for _, _, t in _corpus(43) for w in t.split()
    })
    assert rows[-1]["n_vocab"] == distinct


def test_quantization_fidelity_floor(spark):
    """Random 16-dim vectors keep >= 0.95 cosine fidelity under int8
    and every element error stays under scale/2."""
    from daft_spark.operators.similarity import (
        quantization_distortion_report,
    )

    rng = random.Random(5)
    data = [
        (i, [rng.uniform(-10, 10) for _ in range(16)], f"g{i % 2}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label string"
    )
    rows = quantization_distortion_report(df).collect()
    assert sum(r["n_vecs"] for r in rows) == 30
    for r in rows:
        assert r["min_fidelity"] >= 0.95
        assert r["avg_fidelity"] >= r["min_fidelity"]
        # scale = max|v|/127 <= 10/127; element error < scale/2
        assert r["max_abs_err"] <= 10.0 / 127.0 / 2 + 1e-9


def test_attribution_conservation(spark):
    """Every conversion is credited exactly once and revenue is
    conserved across channels."""
    from daft_spark.operators.funnel import last_touch_attribution

    rng = random.Random(17)
    t0 = dt.datetime(2024, 1, 1)
    rows, total_purchases, total_rev = [], 0, 0.0
    for i in range(200):
        typ = rng.choice(["view", "click", "purchase", "error"])
        v = round(rng.uniform(0, 50), 2)
        if typ == "purchase":
            total_purchases += 1
            total_rev += v
        rows.append(
            (i, t0 + dt.timedelta(seconds=i * 37), i % 9, typ, v)
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = last_touch_attribution(df, ["view", "click"], "purchase", 600).collect()
    assert sum(r["n_conversions"] for r in out) == total_purchases
    assert abs(sum(r["revenue"] for r in out) - total_rev) < 1e-6
