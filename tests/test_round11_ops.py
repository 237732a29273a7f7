"""Unit tests for the round-11 part-2 operator additions: corpus line
dedup, incremental dedup, UniMax temperature mixing, deterministic
reservoir sampling, and the packing-length histogram."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from daft_spark.operators.dedup import incremental_novel, remove_duplicated_lines
from daft_spark.operators.sampling import (
    length_histogram,
    reservoir_sample,
    temperature_mixture,
)


def _lines_df(spark):
    return spark.createDataFrame(
        [
            (1, "nav bar\nunique one\nfooter"),
            (2, "nav bar\nunique two\nfooter"),
            (3, "nav bar\nfooter"),
            (4, "all alone here"),
        ],
        ["doc_id", "text"],
    )


def test_remove_duplicated_lines_keep_first(spark):
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_lines(_lines_df(spark), "text", "doc_id").collect()
    }
    # doc 1 is the canonical first occurrence of both boilerplate lines
    assert out[1]["clean_text"] == "nav bar\nunique one\nfooter"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["n_removed"] == 2
    # doc 3 was pure boilerplate -> empty, counts preserved
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (2, 2)
    assert out[4]["clean_text"] == "all alone here"


def test_remove_duplicated_lines_keep_none(spark):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicated_lines(
            _lines_df(spark), "text", "doc_id", keep="none"
        ).collect()
    }
    # RefinedWeb boilerplate mode: every occurrence goes, incl. the first
    assert out[1] == "unique one"
    assert out[2] == "unique two"
    assert out[3] == ""


def test_remove_duplicated_lines_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        remove_duplicated_lines(_lines_df(spark), "text", "doc_id", keep="last")
    with pytest.raises(ValueError):
        remove_duplicated_lines(_lines_df(spark), "text", "doc_id", min_occurrences=1)


def test_incremental_novel_basic(spark):
    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "seen before"),   # dup of corpus -> dropped
            (11, "fresh text"),    # novel, first
            (12, "fresh text"),    # batch-internal copy
            (13, "another fresh"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r["n_copies"]
        for r in incremental_novel(corpus, batch, "text", "doc_id").collect()
    }
    assert rows == {11: 2, 13: 1}


def test_incremental_novel_normalized(spark):
    corpus = spark.createDataFrame([(1, "Seen Before!")], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, "seen   before"), (11, "new doc")], ["doc_id", "text"]
    )
    rows = incremental_novel(
        corpus, batch, "text", "doc_id", normalized=True
    ).collect()
    assert [r["doc_id"] for r in rows] == [11]


def _mix_df(spark):
    # weights: a=1000, b=100, c=10
    rows = (
        [("a", 10)] * 100 + [("b", 10)] * 10 + [("c", 10)]
    )
    return spark.createDataFrame(
        [(i, g, w) for i, (g, w) in enumerate(rows)], ["id", "grp", "w"]
    )


def test_temperature_mixture_budget_conserved(spark):
    out = temperature_mixture(
        _mix_df(spark), ["grp"], budget=500.0, temperature=2.0,
        max_epochs=1.0, weight_col="w",
    ).collect()
    by = {r["grp"]: r for r in out}
    total_alloc = sum(r["alloc"] for r in out)
    # corpus (1110) exceeds the budget -> water level fills it exactly
    assert math.isclose(total_alloc, 500.0, rel_tol=1e-6)
    for r in out:
        assert r["epochs"] <= 1.0 + 1e-9
        assert r["alloc"] <= r["capacity"] + 1e-9
    # temperature=2 upweights the tail: c gets > proportional share
    assert by["c"]["alloc"] / 500.0 > 10.0 / 1110.0


def test_temperature_mixture_unconstrained_caps(spark):
    out = temperature_mixture(
        _mix_df(spark), ["grp"], budget=1e9, temperature=2.0,
        max_epochs=2.0, weight_col="w",
    ).collect()
    for r in out:
        # budget exceeds total capacity -> every group capped at 2 epochs
        assert math.isclose(r["alloc"], r["capacity"], rel_tol=1e-9)
        assert math.isclose(r["epochs"], 2.0, rel_tol=1e-9)


def test_temperature_mixture_t1_proportional(spark):
    # T=1, no binding cap -> allocation proportional to weight
    out = temperature_mixture(
        _mix_df(spark), ["grp"], budget=111.0, temperature=1.0,
        max_epochs=1.0, weight_col="w",
    ).collect()
    by = {r["grp"]: r["alloc"] for r in out}
    assert math.isclose(by["a"] / by["b"], 10.0, rel_tol=1e-6)
    assert math.isclose(by["b"] / by["c"], 10.0, rel_tol=1e-6)


def test_temperature_mixture_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        temperature_mixture(_mix_df(spark), ["grp", "w"], budget=1.0)
    with pytest.raises(ValueError):
        temperature_mixture(_mix_df(spark), ["grp"], budget=0.0)
    with pytest.raises(ValueError):
        temperature_mixture(_mix_df(spark), ["grp"], budget=1.0, temperature=0.5)


def test_reservoir_sample_uniform_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2)) for i in range(100)], ["id", "grp"]
    )
    a = sorted(
        (r["grp"], r["id"])
        for r in reservoir_sample(df, ["grp"], k=7, id_col="id").collect()
    )
    b = sorted(
        (r["grp"], r["id"])
        for r in reservoir_sample(
            df.repartition(13), ["grp"], k=7, id_col="id"
        ).collect()
    )
    assert a == b and len(a) == 14
    # a different salt picks a different sample
    c = sorted(
        (r["grp"], r["id"])
        for r in reservoir_sample(df, ["grp"], k=7, id_col="id", salt="x").collect()
    )
    assert a != c


def test_reservoir_sample_small_group_and_weighted(spark):
    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 100.0), (3, "g", 1.0)], ["id", "grp", "w"]
    )
    # k exceeds the group -> whole group survives
    assert reservoir_sample(df, ["grp"], k=10, id_col="id").count() == 3
    # weighted: the heavy row is effectively always in a k=1 sample
    out = reservoir_sample(df, ["grp"], k=1, id_col="id", weight_col="w").collect()
    assert out[0]["id"] == 2
    with pytest.raises(ValueError):
        reservoir_sample(df, ["grp"], k=0, id_col="id")


def test_length_histogram_buckets_and_padding(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 64), (5, 65), (6, 0)], ["id", "n"]
    )
    rows = {r["bucket"]: r for r in length_histogram(df, "n", context_len=64).collect()}
    # n=0 dropped; buckets: 1->0, {2,3}->1, 64->6, 65->6
    assert set(rows) == {0, 1, 6}
    assert rows[0]["pad_tokens"] == 63
    assert rows[1]["n_docs"] == 2 and rows[1]["pad_tokens"] == (62 + 61)
    assert rows[6]["n_docs"] == 2
    # 64 pads 0; 65 pads to 128 -> 63
    assert rows[6]["pad_tokens"] == 63
    with pytest.raises(ValueError):
        length_histogram(df, "n", context_len=0)


def test_pq_roundtrip_and_rerank_guard(spark):
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(4)], ["query_id", "query_vec"]
    )
    from daft_spark.operators.similarity import pq_train, pq_encode, topk_cosine_pq

    books = pq_train(corpus, m=4, ksub=8, iters=2)
    assert books.count() == 32  # 4 subspaces x 8 codes
    codes = pq_encode(corpus, books, m=4)
    crow = codes.first()
    assert len(crow["codes"]) == 4 and crow["recon_norm2"] > 0
    # a query that IS a corpus vector must rank itself first after rerank
    out = topk_cosine_pq(queries, corpus, k=1, m=4, ksub=8, rerank=10, iters=2)
    got = {r["query_id"]: r["vec_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    with pytest.raises(ValueError):
        topk_cosine_pq(queries, corpus, k=5, m=4, ksub=8, rerank=2)
    with pytest.raises(ValueError):
        pq_train(corpus, m=5)  # 16 % 5 != 0


def test_top_ngrams_sketch_guarantees(spark):
    # a heavy hitter plus unique tail: the sketch must keep the heavy
    # gram with a count inside the MG sandwich
    docs = [(0, "x y " * 50)] + [
        (i, f"u{i} v{i} w{i}") for i in range(1, 40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from daft_spark.operators.repetition import top_ngrams_sketch

    out = top_ngrams_sketch(df, "text", "doc_id", n=2, k=5, capacity=10)
    rows = {r["ngram"]: r for r in out.collect()}
    assert "x y" in rows
    r = rows["x y"]
    # true count of 'x y' is 50; estimate within [50 - bound, 50]
    assert r["est_count"] <= 50
    assert r["est_count"] >= 50 - r["err_bound"]
    with pytest.raises(ValueError):
        top_ngrams_sketch(df, capacity=0)


def test_bloom_contamination_one_sided(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "completely different words here now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    from daft_spark.operators.dedup import bloom_contamination

    out = {r["doc_id"]: r["flagged"] for r in
           bloom_contamination(docs, bench, "text", "doc_id").collect()}
    assert out[1] is True          # exact contamination always flagged
    assert set(out) == {1, 2, 3}   # row conservation


def test_funnel_steps_strict_ordering(spark):
    from datetime import datetime as dt

    from daft_spark.operators.funnel import funnel_steps

    ev = spark.createDataFrame(
        [
            # u1 completes all three in order
            (1, dt(2024, 1, 1), "view"),
            (1, dt(2024, 1, 2), "click"),
            (1, dt(2024, 1, 3), "purchase"),
            # u2's purchase PRECEDES the click -> funnel breaks at 2
            (2, dt(2024, 1, 1), "view"),
            (2, dt(2024, 1, 2), "purchase"),
            (2, dt(2024, 1, 3), "click"),
            # u3 never views -> not in the funnel at all
            (3, dt(2024, 1, 1), "click"),
            (3, dt(2024, 1, 2), "purchase"),
        ],
        ["user_id", "ts", "event_type"],
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["stage_reached"] == 3 and out[1]["t3"] == dt(2024, 1, 3)
    assert out[2]["stage_reached"] == 2 and out[2]["t3"] is None
    with pytest.raises(ValueError):
        funnel_steps(ev, ["view"])


def test_funnel_repeated_step(spark):
    from datetime import datetime as dt

    from daft_spark.operators.funnel import funnel_steps

    ev = spark.createDataFrame(
        [(1, dt(2024, 1, 1), "click"), (1, dt(2024, 1, 5), "click"),
         (2, dt(2024, 1, 1), "click")],
        ["user_id", "ts", "event_type"],
    )
    out = {r["user_id"]: r for r in funnel_steps(ev, ["click", "click"]).collect()}
    # a second DISTINCT click is required for stage 2
    assert out[1]["stage_reached"] == 2 and out[1]["t2"] == dt(2024, 1, 5)
    assert out[2]["stage_reached"] == 1


def test_retention_cohorts_triangle(spark):
    from datetime import datetime as dt

    from daft_spark.operators.funnel import retention_cohorts

    day = 24 * 3600
    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1)), (1, dt(2024, 1, 2)),   # periods 0, 1
            (2, dt(2024, 1, 1)), (2, dt(2024, 1, 3)),   # periods 0, 2
            (3, dt(2024, 1, 2)),                         # its own cohort
        ],
        ["user_id", "ts"],
    )
    rows = retention_cohorts(ev, "user_id", "ts", period_seconds=day).collect()
    by = {(r["cohort_period"], r["period_n"]): r for r in rows}
    c1 = min(k[0] for k in by)
    assert by[(c1, 0)]["n_active"] == 2 and by[(c1, 0)]["retention"] == 1.0
    assert by[(c1, 1)]["n_active"] == 1 and abs(by[(c1, 1)]["retention"] - 0.5) < 1e-9
    assert by[(c1, 2)]["n_active"] == 1
    # user 3 forms a separate cohort one day later
    assert (c1 + day, 0) in by and by[(c1 + day, 0)]["n_active"] == 1
    with pytest.raises(ValueError):
        retention_cohorts(ev, period_seconds=0)


def test_funnel_within_seconds_breaks_late_hops(spark):
    from datetime import datetime as dt

    from daft_spark.operators.funnel import funnel_steps

    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 0, 0), "view"),
            (1, dt(2024, 1, 1, 0, 30), "click"),     # 30 min later: inside 1h
            (1, dt(2024, 1, 1, 3, 0), "purchase"),   # 2.5h after click: outside
            (2, dt(2024, 1, 1, 0, 0), "view"),
            (2, dt(2024, 1, 1, 2, 0), "click"),      # 2h later: outside 1h
        ],
        ["user_id", "ts", "event_type"],
    )
    out = {
        r["user_id"]: r["stage_reached"]
        for r in funnel_steps(
            ev, ["view", "click", "purchase"], within_seconds=3600
        ).collect()
    }
    assert out == {1: 2, 2: 1}


def test_top_event_paths_model(spark):
    from datetime import datetime as dt

    from daft_spark.operators.funnel import top_event_paths

    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1), "a"), (1, dt(2024, 1, 2), "b"),
            (1, dt(2024, 1, 3), "c"), (1, dt(2024, 1, 4), "b"),
            (2, dt(2024, 1, 1), "a"), (2, dt(2024, 1, 2), "b"),
            (2, dt(2024, 1, 3), "c"),
        ],
        ["user_id", "ts", "event_type"],
    )
    rows = top_event_paths(ev, length=3, k=10).collect()
    by = {r["path"]: (r["n_occurrences"], r["n_users"]) for r in rows}
    assert by["a>b>c"] == (2, 2)
    assert by["b>c>b"] == (1, 1)
    with pytest.raises(ValueError):
        top_event_paths(ev, length=1)


def test_pagerank_properties(spark):
    import math

    from daft_spark.operators.cluster import pagerank

    # star graph: hub <-> 4 spokes; hub must dominate, ranks sum to 1
    edges = []
    for s in ["s1", "s2", "s3", "s4"]:
        edges.append(("hub", s))
        edges.append((s, "hub"))
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9)
    assert out["hub"] > max(v for k, v in out.items() if k != "hub")
    spoke_vals = [v for k, v in out.items() if k != "hub"]
    assert max(spoke_vals) - min(spoke_vals) < 1e-12  # symmetry
    # dangling-only graph: one edge a->b, b dangles; mass conserved
    e2 = spark.createDataFrame([("a", "b")], ["src", "dst"])
    out2 = {r["node"]: r["rank"] for r in pagerank(e2, iters=3).collect()}
    assert math.isclose(sum(out2.values()), 1.0, rel_tol=1e-9)
    assert out2["b"] > out2["a"]
    with pytest.raises(ValueError):
        pagerank(e, iters=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)


def test_bpe_train_learns_expected_merges(spark):
    from daft_spark.operators.bpe_train import bpe_apply_merges, bpe_train

    # 'abab' dominates: first merge must be (a,b), second fuses 'ab'+'ab'
    df = spark.createDataFrame(
        [(0, "abab abab abab xy")], ["doc_id", "text"]
    )
    merges, final = bpe_train(df, "text", num_merges=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "ab")
    rows = {r["word"]: r["syms"] for r in final.collect()}
    assert rows["abab"] == ["abab"]
    assert rows["xy"] == ["x", "y"]
    # serving parity: re-applying merges to fresh char splits agrees
    from daft_spark.operators.bpe_train import char_split

    fresh = final.select("word", "freq", char_split(F.col("word")).alias("syms"))
    re2 = {r["word"]: r["syms"] for r in bpe_apply_merges(fresh, merges).collect()}
    assert re2 == rows
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=0)


def test_bpe_merge_non_overlapping_left_to_right(spark):
    from daft_spark.operators.bpe_train import bpe_apply_merges

    words = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a"])], ["word", "freq", "syms"]
    )
    out = bpe_apply_merges(words, [("a", "a")]).collect()[0]["syms"]
    # left-to-right non-overlapping: aa + a, never a + aa
    assert out == ["aa", "a"]


def test_resample_gapfill_forward_fill(spark):
    from datetime import datetime as dt

    from daft_spark.operators.funnel import resample_gapfill

    day = 24 * 3600
    ev = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1), 10.0),
            (1, dt(2024, 1, 1, 12), 5.0),   # same bucket -> sum 15
            (1, dt(2024, 1, 4), 7.0),       # two-day gap
        ],
        ["user_id", "ts", "value"],
    )
    rows = resample_gapfill(ev, period_seconds=day).orderBy("period_start").collect()
    assert len(rows) == 4  # 1st..4th dense
    assert rows[0]["period_sum"] == 15.0 and rows[0]["is_gap"] is False
    assert rows[1]["is_gap"] is True and rows[1]["period_sum"] is None
    assert rows[1]["filled_sum"] == 15.0 and rows[2]["filled_sum"] == 15.0
    assert rows[3]["period_sum"] == 7.0 and rows[3]["filled_sum"] == 7.0
    with pytest.raises(ValueError):
        resample_gapfill(ev, period_seconds=0)


def test_profile_columns_stats(spark):
    from daft_spark.operators.funnel import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (3, "a")], ["x", "y"]
    )
    rows = {r["column"]: r for r in profile_columns(df, ["x", "y"]).collect()}
    assert rows["x"]["n_rows"] == 4 and rows["x"]["n_nulls"] == 0
    assert rows["x"]["n_distinct"] == 3
    assert rows["x"]["min_value"] == "1" and rows["x"]["max_value"] == "3"
    assert rows["y"]["n_nulls"] == 1 and abs(rows["y"]["null_frac"] - 0.25) < 1e-9
    assert rows["y"]["n_distinct"] == 2  # count_distinct ignores nulls
    # approx mode returns plausible estimates without an exact shuffle
    approx = {r["column"]: r["n_distinct"]
              for r in profile_columns(df, ["x"], approx_distinct=True).collect()}
    assert approx["x"] >= 2
    with pytest.raises(ValueError):
        profile_columns(df, [])


def test_binarize_and_hamming_model(spark):
    from daft_spark.operators.similarity import binarize_embeddings, topk_cosine_binary

    # 64-dim vectors -> 2 words (63+1). Identical vectors have Hamming 0,
    # so a query that IS a corpus vector must rank itself first.
    import random

    random.seed(3)
    rows = [(i, [random.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bits = binarize_embeddings(corpus).collect()
    assert all(len(r["bits"]) == 2 for r in bits)
    # python model of the packing
    r0 = next(r for r in bits if r["vec_id"] == 0)
    v0 = rows[0][1]
    w0 = sum(1 << i for i in range(63) if v0[i] > 0)
    w1 = sum(1 << i for i, x in enumerate(v0[63:]) if x > 0)
    assert (r0["bits"][0], r0["bits"][1]) == (w0, w1)
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(3)], ["query_id", "query_vec"]
    )
    out = topk_cosine_binary(queries, corpus, k=1, rerank=5)
    got = {r["query_id"]: r["vec_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    with pytest.raises(ValueError):
        topk_cosine_binary(queries, corpus, k=10, rerank=5)


def test_ivfpq_self_retrieval_and_fuzzy_contamination(spark):
    import random

    from daft_spark.operators.dedup import fuzzy_contamination
    from daft_spark.operators.similarity import topk_cosine_ivfpq

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(3)], ["query_id", "query_vec"]
    )
    out = topk_cosine_ivfpq(
        queries, corpus, k=1, num_centroids=4, nprobe=4, m=4, ksub=8,
        rerank=10, iters=2,
    )
    got = {r["query_id"]: r["vec_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # nprobe=all -> self always found

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark aggregation plans"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        # near-copy of doc 1 (one word changed)
        [(7, "the quick brown fox jumps over the lazy cat today")],
        ["doc_id", "text"],
    )
    out2 = {
        r["doc_id"]: r
        for r in fuzzy_contamination(docs, bench, threshold=0.3).collect()
    }
    assert out2[1]["contaminated"] is True and out2[1]["n_bench_matches"] == 1
    assert out2[2]["contaminated"] is False
    assert out2[1]["max_jaccard"] > 0.3


def test_pq_empty_cluster_codes_preserved_and_adc_exact(spark):
    """Regression (r11 ADVICE medium): a corpus with fewer distinct
    subvectors than ksub guarantees empty k-means clusters every Lloyd
    round; pq_train must keep the dropped codes' previous centroids so
    every subspace retains its full contiguous code set, and the ADC
    LUT must index by the lut's true per-subspace stride. Oracle: ADC
    scores replayed exactly from the collected (tiny) codebook."""
    import math

    from daft_spark.operators.similarity import (
        pq_encode,
        pq_train,
        topk_cosine_pq,
    )

    # 40 rows but only 3 distinct vectors -> duplicate init centroids
    base = [[1.0] * 16, [0.5] * 8 + [-0.5] * 8, [-1.0] * 16]
    rows = [(i, base[i % 3]) for i in range(40)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(0, base[0]), (1, base[2])], ["query_id", "query_vec"]
    )
    m, ksub = 4, 8
    books = pq_train(corpus, m=m, ksub=ksub, iters=3)
    per_sub = {r["subspace"]: r["n"] for r in
               books.groupBy("subspace").agg(F.count("*").alias("n")).collect()}
    # full contiguous code set survives empty clusters, uniformly
    assert set(per_sub) == {0, 1, 2, 3} and set(per_sub.values()) == {ksub}
    code_rows = {(r["subspace"], r["code"]): r["centroid"]
                 for r in books.collect()}
    for s in range(m):
        assert sorted(c for (ss, c) in code_rows if ss == s) == list(range(ksub))

    # ADC with rerank=None must equal the python replay from books+codes
    codes = {r["vec_id"]: r["codes"] for r in
             pq_encode(corpus, books, m=m).collect()}
    out = topk_cosine_pq(
        queries, corpus, k=40, m=m, ksub=ksub, rerank=None, iters=3
    ).collect()
    assert len(out) == 80 and all(r["sim"] is not None for r in out)
    sub = 16 // m
    for r in out:
        q = dict(zip([0, 1], [base[0], base[2]]))[r["query_id"]]
        recon = []
        for s in range(m):
            recon += code_rows[(s, codes[r["vec_id"]][s])]
        dot = sum(a * b for a, b in zip(q, recon))
        expect = dot / math.sqrt(
            sum(x * x for x in q) * sum(x * x for x in recon)
        )
        assert abs(r["sim"] - expect) < 1e-9, (r, expect)


def test_reservoir_weighted_rejects_nonpositive_weights(spark):
    """Regression (r11 ADVICE low): w<=0 or null weights are undefined
    under A-ES (w=0 never sampled, w<0 always wins) — must raise, not
    silently skew the sample."""
    from py4j.protocol import Py4JJavaError

    bad = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 0.0), (3, "a", 1.0)], ["id", "grp", "w"]
    )
    with pytest.raises(Exception) as ei:
        reservoir_sample(bad, ["grp"], k=2, id_col="id", weight_col="w").collect()
    assert "must be > 0" in str(ei.value)
    neg = spark.createDataFrame([(1, "a", -1.0)], ["id", "grp", "w"])
    with pytest.raises(Exception):
        reservoir_sample(neg, ["grp"], k=1, id_col="id", weight_col="w").collect()
    nul = spark.createDataFrame(
        [(1, "a", None)], "id long, grp string, w double"
    )
    with pytest.raises(Exception):
        reservoir_sample(nul, ["grp"], k=1, id_col="id", weight_col="w").collect()
    ok = spark.createDataFrame(
        [(i, "a", float(i % 3 + 1)) for i in range(20)], ["id", "grp", "w"]
    )
    assert reservoir_sample(ok, ["grp"], k=5, id_col="id", weight_col="w").count() == 5
