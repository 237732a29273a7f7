"""Operator-level tests not covered by the oracle registry: IVF
assignment, SRP-LSH top-k, deterministic hyperplanes, shard strategies,
minhash signature properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_ivf_assign(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.similarity import cosine_similarity, ivf_assign

    emb = load_table(spark, SF_DIR, "embeddings")
    # centroids = per-label element-wise means
    ex = emb.select("label", F.posexplode("embedding").alias("i", "x"))
    cent = (
        ex.groupBy("label", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select(
            F.col("label").alias("centroid_id"),
            F.transform("pairs", lambda p: p.getField("cx")).alias("centroid"),
        )
    )
    assigned = ivf_assign(emb, cent, corpus_id="vec_id")
    assert assigned.count() == emb.count()
    assert "centroid_id" in assigned.columns
    # correctness: assignment equals an independently computed argmax
    from pyspark.sql import Window

    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_id",
        cosine_similarity(F.col("embedding"), F.col("centroid")).alias("s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("s").desc(), F.col("centroid_id"))
    expected = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("exp_cid"))
    )
    mism = assigned.join(expected, "vec_id").filter(
        F.col("centroid_id") != F.col("exp_cid")
    ).count()
    assert mism == 0
    # sanity: assignments beat chance w.r.t. the label structure
    agree = assigned.filter(F.col("centroid_id") == F.col("label")).count()
    assert agree / assigned.count() > 0.2


def test_srp_hyperplanes_deterministic(spark):
    from daft_spark.operators.similarity import _hyperplanes

    a = _hyperplanes(8, 64, seed=42)
    b = _hyperplanes(8, 64, seed=42)
    c = _hyperplanes(8, 64, seed=7)
    assert a == b and a != c
    assert all(-1.0 <= x <= 1.0 for row in a for x in row)


def test_topk_lsh_subset_of_bucket(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.similarity import topk_cosine_lsh

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_cosine_lsh(queries, emb, k=5, dim=64, num_planes=4)
    rows = out.collect()
    # each query returns at most k, ranks are 1..k, self is rank 1 (sim=1)
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        best = min(rs, key=lambda x: x["rank"])
        assert best["vec_id"] == qid and best["sim"] == pytest.approx(1.0, abs=1e-6)


def test_shard_strategies_partition_data(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.shard import shard

    e = load_table(spark, SF_DIR, "events")
    total = e.count()
    # hash strategy: shards are disjoint and complete
    counts = [shard(e, 4, r, key="event_id").count() for r in range(4)]
    assert sum(counts) == total
    assert all(c > 0 for c in counts)
    # same rank twice -> same rows (deterministic)
    ids1 = sorted(r["event_id"] for r in shard(e, 4, 2, key="event_id").select("event_id").collect())
    ids2 = sorted(r["event_id"] for r in shard(e, 4, 2, key="event_id").select("event_id").collect())
    assert ids1 == ids2
    with pytest.raises(ValueError):
        shard(e, 4, 4, key="event_id")
    with pytest.raises(ValueError):
        shard(e, 4, 0, key="event_id", strategy="bogus")


def test_minhash_signature_similarity_property(spark):
    """Signature agreement rate ≈ Jaccard: near-identical docs agree on
    most hash slots, unrelated docs on almost none."""
    from daft_spark.operators.dedup import minhash_signatures

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("lazy", "sleepy")
    other = "completely different words about spark parquet shuffle exchange aggregate plans"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    sig = {r["__id"]: [r[f"__m{i}"] for i in range(64)] for r in minhash_signatures(df, "text", "doc_id").collect()}
    agree_12 = sum(a == b for a, b in zip(sig[1], sig[2])) / 64
    agree_13 = sum(a == b for a, b in zip(sig[1], sig[3])) / 64
    assert agree_12 > 0.5
    assert agree_13 < 0.1


def test_string_agg_and_product(spark):
    from daft_spark.functions.aggs import collect_set_sorted, product, string_agg

    df = spark.createDataFrame(
        [(1, 2.0, "b"), (1, -3.0, "a"), (1, 4.0, "b"), (2, 0.0, "z"), (3, None, "q")],
        "g long, v double, s string",
    )
    out = {r["g"]: r for r in df.groupBy("g").agg(
        product("v").alias("p"),
        string_agg("s", "|").alias("sa"),
        collect_set_sorted("s").alias("ss"),
    ).collect()}
    assert out[1]["p"] == pytest.approx(-24.0)
    assert out[1]["sa"] == "a|b|b"
    assert out[1]["ss"] == ["a", "b"]
    assert out[2]["p"] == 0.0
    assert out[3]["p"] is None  # all-null group


def test_asof_broadcast_path_matches_window_path(spark):
    """The broadcast-range fast path and the union+window plan must
    produce identical results for all three strategies, including
    no-match lefts and by-groups absent from the right."""
    from daft_spark.operators.asof_join import join_asof

    left = spark.createDataFrame(
        [("a", 5, 1), ("a", 12, 2), ("a", 30, 3), ("b", 7, 4), ("c", 9, 5)],
        "k string, t long, lid int",
    )
    right = spark.createDataFrame(
        [("a", 3, 10.0), ("a", 12, 20.0), ("a", 25, 30.0), ("b", 8, 40.0)],
        "k string, t long, rv double",
    )
    for strat in ("backward", "forward", "nearest"):
        w = join_asof(left, right, on="t", by="k", strategy=strat,
                      broadcast=False).orderBy("lid").collect()
        b = join_asof(left, right, on="t", by="k", strategy=strat,
                      broadcast=True).orderBy("lid").collect()
        assert [r.asDict() for r in w] == [r.asDict() for r in b], strat
    # global (no by) broadcast path too
    for strat in ("backward", "forward", "nearest"):
        w = join_asof(left.drop("k"), right.drop("k"), on="t", strategy=strat,
                      broadcast=False).orderBy("lid").collect()
        b = join_asof(left.drop("k"), right.drop("k"), on="t", strategy=strat,
                      broadcast=True).orderBy("lid").collect()
        assert [r.asDict() for r in w] == [r.asDict() for r in b], strat


def test_embedding_near_dups_precision_and_star_cap(spark):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.similarity import (
        embedding_near_dups,
        pairs_above_threshold,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in pairs_above_threshold(emb, 0.3).select("id_a", "id_b").collect()
    }
    mined = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, 0.3, dim=64, num_planes=32, bands=16)
        .select("id_a", "id_b")
        .collect()
    }
    assert mined <= exact  # exact-verify => precision 1
    assert len(mined) >= 0.95 * len(exact)

    # degenerate max_bucket_size forces EVERY bucket down the star path:
    # output must stay a subset of exact pairs (star edges are verified
    # too) and still include the representative's own edges
    starred = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            emb, 0.3, dim=64, num_planes=32, bands=16, max_bucket_size=1
        )
        .select("id_a", "id_b")
        .collect()
    }
    assert starred <= exact

    # the star path is the shared broadcast-representative join
    # (_capped_bucket_pairs); the only collect_list in the plan is the
    # small-bucket pair expansion, whose input is the cap-filtered
    # branch (oversized buckets are diverted to star links BEFORE the
    # aggregate), so every aggregation buffer is bounded by
    # max_bucket_size — assert the cap filter guards the aggregate
    plan = (
        embedding_near_dups(
            emb, 0.3, dim=64, num_planes=32, bands=16, max_bucket_size=1
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "isnull(__bc" in plan  # small branch = buckets under the cap only

    with pytest.raises(ValueError):
        embedding_near_dups(emb, 0.3, dim=64, num_planes=30, bands=16)


def test_sampling_operators_edges(spark):
    """stratified_sample: exact quotas, smaller strata kept whole,
    deterministic across invocations. token_budget_select: greedy
    prefix in md5 order, a group whose first doc exceeds the budget
    contributes nothing."""
    from daft_spark.operators.sampling import (
        stratified_sample,
        token_budget_select,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "small", 10 if i % 2 else 1000)
         for i in range(56)],
        "id long, grp string, w long",
    )
    s = stratified_sample(df, ["grp"], 5, "id")
    counts = {r["grp"]: r["n"] for r in s.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 5, "small": 5}
    # small stratum below quota keeps every row
    s2 = stratified_sample(df.filter(F.col("grp") == "small"), ["grp"], 99, "id")
    assert s2.count() == 6
    # deterministic: two invocations pick identical rows
    ids1 = sorted(r["id"] for r in s.collect())
    ids2 = sorted(r["id"] for r in stratified_sample(df, ["grp"], 5, "id").collect())
    assert ids1 == ids2

    kept = token_budget_select(df, ["grp"], "w", 25, "id")
    rows = {(r["grp"], r["id"]): r["__cum"] for r in kept.collect()}
    # every kept row's running total respects the budget
    assert all(c <= 25 for c in rows.values())
    # groups whose md5-first doc weighs 1000 contribute nothing
    kept_grps = {g for g, _ in rows}
    for g in ("big", "small"):
        first = (
            df.filter(F.col("grp") == g)
            .orderBy(F.md5(F.col("id").cast("string")), "id")
            .limit(1)
            .collect()[0]
        )
        if first["w"] > 25:
            assert g not in kept_grps
        else:
            assert g in kept_grps


def test_pack_sequences_offsets_contiguous_and_conserving(spark):
    """Packing invariants: within each group, offsets tile the token
    stream exactly (next start == previous end), the first start is 0,
    and sequence indices follow from the boundary arithmetic."""
    import random

    from pyspark.sql import functions as F

    from daft_spark.operators.sampling import pack_sequences

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(0, 90))),
         f"src{i % 3}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = pack_sequences(df, "text", "doc_id", seq_len=64, by=["source"]).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(out) == 200
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["start_offset"])
        assert rs[0]["start_offset"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["start_offset"] + a["n_tokens"] == b["start_offset"], (src, a, b)
        for r in rs:
            assert r["first_seq"] == r["start_offset"] // 64
            end = r["start_offset"] + r["n_tokens"]
            assert r["last_seq"] == (end - 1) // 64
            assert r["n_seqs_spanned"] == r["last_seq"] - r["first_seq"] + 1


def test_hash_split_deterministic_proportions_and_salt(spark):
    """hash_split: assignment is a pure function of (id, salt) — stable
    under repartitioning; proportions approach the weights; a different
    salt draws an independent split."""
    from pyspark.sql import functions as F

    from daft_spark.operators.sampling import hash_split

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(
        df.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b  # partitioning-independent (randomSplit is not)
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 4000 - 0.8) < 0.03
    assert abs(c["val"] / 4000 - 0.1) < 0.02
    assert abs(c["test"] / 4000 - 0.1) < 0.02
    s2 = {r["doc_id"]: r["split"] for r in hash_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="other").collect()}
    moved = sum(1 for k in a if a[k] != s2[k])
    assert moved > 800  # independent draw, not a shifted boundary
    import pytest

    with pytest.raises(ValueError, match="non-negative"):
        hash_split(df, {"a": -1.0, "b": 2.0})


def test_span_removal_conserves_untouched_tokens(spark):
    """Property over a random corpus with planted duplicates: removed
    token counts are consistent (n_removed = n_tokens - len(clean
    tokens)); docs with no cross-doc window keep their exact
    (normalized) text; keep='none' removes at least as much as
    keep='first'."""
    import random

    from daft_spark.operators.dedup import remove_duplicated_spans, normalize_text
    from pyspark.sql import functions as F

    rng = random.Random(11)
    plant = " ".join(f"p{i}" for i in range(23))
    rows = []
    for i in range(60):
        base = " ".join(f"w{rng.randrange(2000)}" for _ in range(40))
        if i % 5 == 0:
            base = base + " " + plant
        rows.append((i, base))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    first = {r["doc_id"]: r for r in remove_duplicated_spans(df, "text", "doc_id").collect()}
    none = {r["doc_id"]: r for r in remove_duplicated_spans(
        df, "text", "doc_id", keep="none").collect()}
    norm = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_text(F.col("text")).alias("n")).collect()
    }
    for i, r in first.items():
        kept_tokens = r["clean_text"].split(" ") if r["clean_text"] else []
        assert r["n_tokens"] - r["n_removed"] == len(kept_tokens), r
        assert none[i]["n_removed"] >= r["n_removed"]
        if i % 5 != 0:  # no planted dup -> untouched
            assert r["n_removed"] == 0
            assert r["clean_text"] == norm[i]
    # exactly one planted copy survives under keep='first'
    survivors = [
        i for i in first
        if i % 5 == 0 and plant in first[i]["clean_text"]
    ]
    assert survivors == [0]


def test_apply_mixture_materializes_rates_and_composes(spark):
    """apply_mixture: the dict path is a pure filter (zero shuffle), the
    frame path broadcast-joins mixture_weights' output, both agree; the
    binding rate-1 group keeps every row, absent groups drop, and kept
    fractions approach the rates."""
    from collections import Counter

    from pyspark.sql import functions as F

    from daft_spark.operators.sampling import apply_mixture, mixture_weights

    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    # dict path: g0 kept whole, g1 halved, g2 (absent) dropped
    kept = apply_mixture(df, {"g0": 1.0, "g1": 0.5}, ["source"]).collect()
    c = Counter(r["source"] for r in kept)
    assert c["g0"] == 2000
    assert "g2" not in c
    assert abs(c["g1"] / 2000 - 0.5) < 0.05
    # pure expression: no exchange anywhere in the dict-path plan
    plan = apply_mixture(
        df, {"g0": 1.0, "g1": 0.5}, ["source"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # repartitioning cannot move a row's membership
    kept_ids = sorted(r["doc_id"] for r in kept)
    kept2 = sorted(
        r["doc_id"]
        for r in apply_mixture(
            df.repartition(17), {"g0": 1.0, "g1": 0.5}, ["source"]
        ).collect()
    )
    assert kept_ids == kept2
    # composition with mixture_weights: equal-sized groups toward a
    # 1/2:1/4:1/4 target -> rates (1.0, 0.5, 0.5); the frame path must
    # equal the dict path with those rates and broadcast, not shuffle
    rates = mixture_weights(df, ["source"], {"g0": 0.5, "g1": 0.25, "g2": 0.25})
    rmap = {r["source"]: r["sample_rate"] for r in rates.collect()}
    assert rmap == {"g0": 1.0, "g1": 0.5, "g2": 0.5}
    via_frame = apply_mixture(df, rates, ["source"], salt="s")
    fplan = via_frame._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fplan, fplan
    got_f = sorted(r["doc_id"] for r in via_frame.collect())
    got_d = sorted(
        r["doc_id"] for r in apply_mixture(df, rmap, ["source"], salt="s").collect()
    )
    assert got_f == got_d
    import pytest

    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        apply_mixture(df, {"g0": 1.5}, ["source"])
    with pytest.raises(ValueError, match="one grouping column"):
        apply_mixture(df, {"g0": 1.0}, ["source", "doc_id"])


def test_default_sharding_is_deterministic_and_replayable(spark):
    """pack_sequences / perplexity_buckets with by=None auto-shard via
    floor(md5-uniform * n_shards): the assignment must match a DuckDB
    replay of the identical hex-nibble arithmetic (the oracle contract
    for the default path) and per-shard packing invariants must hold."""
    import duckdb
    from pyspark.sql import functions as F

    from daft_spark.operators.sampling import pack_sequences

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.repeat(F.lit("x "), (F.col("id") % 7 + 1).cast("int"))).alias("text"),
    )
    out = pack_sequences(df, "text", "doc_id", seq_len=16, n_shards=8).collect()
    assert {r["shard"] for r in out} <= set(range(8))
    got = {r["doc_id"]: r["shard"] for r in out}
    exp = dict(
        duckdb.sql(
            """
            SELECT i, CAST(floor(
              list_sum(list_transform(range(1, 14), j ->
                (strpos('0123456789abcdef',
                        substr(md5(CAST(i AS VARCHAR) || 'shard'), j, 1)) - 1)
                * 2.0 ** (4 * (13 - j)))) / 2.0 ** 52 * 8) AS INT)
            FROM range(300) t(i)
            """
        ).fetchall()
    )
    assert got == exp
    # per-shard streams: contiguous offsets from 0 within each shard
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r["start_offset"])
        assert rs[0]["start_offset"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["start_offset"] + a["n_tokens"] == b["start_offset"]
    # by=[] stays the exact global stream (no shard column)
    g = pack_sequences(df, "text", "doc_id", seq_len=16, by=[]).collect()
    assert "shard" not in g[0].asDict()
    assert sorted(r["start_offset"] for r in g)[0] == 0
    assert len({r["doc_id"] for r in g}) == 300


def test_perplexity_buckets_default_shards_ntile(spark):
    """perplexity_buckets by=None: buckets are per-shard ntiles (each
    shard splits ~evenly), the shard column is returned, and by=[]
    still gives the exact global ntile."""
    from collections import Counter

    from pyspark.sql import functions as F

    from daft_spark.operators.lm import perplexity_buckets

    df = spark.range(240).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("a b c d "), F.repeat(F.lit("e f "), (F.col("id") % 5).cast("int"))
        ).alias("text"),
    )
    out = perplexity_buckets(df, "text", "doc_id", n_buckets=3, n_shards=4).collect()
    assert {r["shard"] for r in out} <= set(range(4))
    for s in {r["shard"] for r in out}:
        c = Counter(r["bucket"] for r in out if r["shard"] == s)
        assert max(c.values()) - min(c.values()) <= 1  # ntile balance per shard
    glob = perplexity_buckets(df, "text", "doc_id", n_buckets=3, by=[]).collect()
    assert "shard" not in glob[0].asDict()
    c = Counter(r["bucket"] for r in glob)
    assert max(c.values()) - min(c.values()) <= 1


def test_chunk_text_windows_and_plan(spark):
    """chunk_text: overlapping windows reconstruct the document (each
    token appears in ceil-coverage), boundaries are exact, empty docs
    emit nothing, and the plan has no shuffle and no Python UDF."""
    from pyspark.sql import functions as F

    from daft_spark.operators.sampling import chunk_text

    rows = [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_text(df, "text", "doc_id", chunk_tokens=4, overlap=1).collect()
    d1 = sorted((r["chunk_id"], r["start_token"], r["chunk_text"])
                for r in out if r["doc_id"] == 1)
    # stride 3, starts capped at n - overlap = 9 (1-based): 0, 3, 6 —
    # a start at 9 would yield "w9", fully contained in chunk 2
    # (r10 verdict task 4)
    assert d1 == [
        (0, 0, "w0 w1 w2 w3"),
        (1, 3, "w3 w4 w5 w6"),
        (2, 6, "w6 w7 w8 w9"),
    ]
    assert [r["chunk_text"] for r in out if r["doc_id"] == 2] == ["a b c"]
    assert not [r for r in out if r["doc_id"] == 3]
    # containment property: across doc lengths / chunk sizes / overlaps,
    # no chunk is ever fully contained in another, every token is
    # covered, and short docs still produce one whole-document chunk
    for n, ck, ov in [(10, 4, 2), (10, 4, 1), (7, 3, 2), (2, 4, 3), (5, 5, 4)]:
        doc = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(n)))],
            "doc_id long, text string",
        )
        ch = sorted(
            (r["start_token"], r["start_token"] + r["n_tokens"])
            for r in chunk_text(doc, "text", "doc_id", ck, ov).collect()
        )
        covered = set()
        for s, e in ch:
            covered.update(range(s, e))
        assert covered == set(range(n)), (n, ck, ov, ch)
        for i, (s1, e1) in enumerate(ch):
            for j, (s2, e2) in enumerate(ch):
                if i != j:
                    assert not (s1 <= s2 and e2 <= e1), (n, ck, ov, ch)
    plan = chunk_text(df, "text", "doc_id", 4, 1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_quantize_embeddings_bounds_and_recall(spark):
    """quantize_embeddings: elements live in [-127, 127], max|v| maps
    to ±127 exactly, zero vectors give scale 0 + zero vector, and
    dequantized cosine stays within quantization error of the exact
    cosine (>0.99 for random vectors)."""
    import math
    import random

    from pyspark.sql import functions as F

    from daft_spark.operators.similarity import quantize_embeddings

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(50)]
    rows.append((50, [0.0] * 32))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    orig = {i: v for i, v in rows}
    for i, r in out.items():
        q, s = r["qvec"], r["scale"]
        assert all(-127 <= x <= 127 for x in q)
        if i == 50:
            assert s == 0.0 and set(q) == {0}
            continue
        assert max(abs(x) for x in q) == 127
        # dequantized cosine vs exact cosine
        v = orig[i]
        deq = [x * s for x in q]
        num = sum(a * b for a, b in zip(v, deq))
        den = math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in deq))
        assert num / den > 0.99, (i, num / den)
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan, plan


def test_quantized_ivf_probe_all_equals_bruteforce_quantized(spark):
    """With nprobe == num_centroids every centroid partition is probed,
    so the candidate set is the whole corpus and topk_cosine_quantized_ivf
    must return EXACTLY the brute-force quantized top-k (same integer
    kernel, same (sim desc, id) tiebreak) — the blocking layer adds
    routing, never a different score."""
    import random

    from daft_spark.operators.similarity import (
        topk_cosine_quantized,
        topk_cosine_quantized_ivf,
    )

    rng = random.Random(11)
    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(3)],
        "query_id long, query_vec array<float>",
    )
    brute = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
        for r in topk_cosine_quantized(queries, corpus, k=4).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
        for r in topk_cosine_quantized_ivf(
            queries, corpus, k=4, num_centroids=4, nprobe=4, iters=1
        ).collect()
    }
    assert ivf == brute
    # and with fewer probes the result is a (possibly lossy) subset of
    # legal rows: every hit scored identically to the brute kernel
    part = topk_cosine_quantized_ivf(
        queries, corpus, k=4, num_centroids=4, nprobe=2, iters=1
    ).collect()
    brute_sims = {
        (r["query_id"], r["vec_id"]): round(r["sim"], 9)
        for r in topk_cosine_quantized(queries, corpus, k=60).collect()
    }
    for r in part:
        assert brute_sims[(r["query_id"], r["vec_id"])] == round(r["sim"], 9)


def test_pca_fit_matches_local_numpy(spark):
    """pca_fit's distributed Gramian-partial covariance must equal the
    local numpy covariance exactly up to float-sum order (1e-9), the
    components must be eigh's (sign-fixed), and whitened projections
    must have unit variance per component."""
    import numpy as np

    from daft_spark.operators.pca import pca_fit, pca_transform

    rng = np.random.default_rng(5)
    # anisotropic data so eigenvalues are well separated
    x = rng.normal(size=(200, 6)) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    x = x + np.array([1.0, -2.0, 0.0, 3.0, 0.0, 0.5])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(7)  # force multi-partition partials
    model = pca_fit(df, "embedding", n_components=4)
    assert model["n"] == 200 and model["dim"] == 6
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    np.testing.assert_allclose(
        model["eigenvalues"], evals[order], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(model["mean"], x.mean(axis=0), atol=1e-9)
    w = np.asarray(model["components"])
    ref = evecs[:, order].T
    for i in range(4):  # compare up to the deterministic sign fix
        r = ref[i] if ref[i][np.argmax(np.abs(ref[i]))] > 0 else -ref[i]
        np.testing.assert_allclose(w[i], r, atol=1e-9)
    # projection: variance per component == eigenvalue; whitened == 1
    proj = pca_transform(df, model, "embedding")
    y = np.stack([r["proj"] for r in proj.orderBy("vec_id").collect()])
    np.testing.assert_allclose(
        y.var(axis=0, ddof=1), model["eigenvalues"], rtol=1e-9
    )
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-9)
    wh = pca_transform(df, model, "embedding", whiten=True)
    z = np.stack([r["proj"] for r in wh.orderBy("vec_id").collect()])
    np.testing.assert_allclose(z.var(axis=0, ddof=1), 1.0, rtol=1e-9)
    # schema: proj appended after the original columns
    assert proj.columns == ["vec_id", "embedding", "proj"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        pca_fit(df.filter("vec_id < 0"), "embedding", 2)


def test_dsir_weights_edges_and_direction(spark):
    """dsir_log_weights: target-like docs score higher than off-target
    docs; empty docs get n_grams=0 / weight 0.0; every raw row
    survives; dsir_select(gumbel=False) is the argmax top-k."""
    from daft_spark.operators.dsir import dsir_log_weights, dsir_select

    tgtish = "alpha beta gamma delta " * 8
    offish = "omega sigma tau upsilon " * 8
    rows = [(0, tgtish), (1, offish), (2, ""), (3, tgtish + offish)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame([(100, tgtish)], "doc_id long, text string")
    w = {r["doc_id"]: r for r in dsir_log_weights(raw, target).collect()}
    assert set(w) == {0, 1, 2, 3}
    assert w[2]["n_grams"] == 0 and w[2]["log_weight"] == 0.0
    assert w[0]["log_weight"] > w[3]["log_weight"] > w[1]["log_weight"]
    # the empty doc's 0.0 can legitimately beat mixed docs (DSIR is
    # length-sensitive); the clear target-like doc must rank first
    top = dsir_select(raw, target, k=2, gumbel=False).collect()
    assert top[0]["doc_id"] == 0
    assert [r["doc_id"] for r in top] == sorted(
        w, key=lambda i: (-w[i]["log_weight"], i)
    )[:2]


def test_quality_classifier_separates_and_score_margin_is_normalized(spark):
    """train_quality_classifier reaches AUC 1.0 on a cleanly separable
    vocabulary split, and score_quality's margin is the NORMALIZED
    sum_b (c_b / n) w_b + bias (regression: an early version
    re-multiplied by n_grams, washing out the normalization)."""
    import math
    import random

    from daft_spark.operators.classifier import (
        quality_auc,
        score_quality,
        train_quality_classifier,
    )
    from daft_spark.operators.dsir import _gram_buckets

    rng = random.Random(3)
    posw = ["alpha", "beta", "gamma", "delta", "epsilon"]
    negw = ["omega", "sigma", "tau", "phi", "chi"]
    shared = ["the", "of", "and", "data", "model"]

    def mk(words):
        return " ".join(rng.choice(words + shared) for _ in range(40))

    pos = spark.createDataFrame(
        [(i, mk(posw)) for i in range(60)], "doc_id long, text string"
    )
    neg = spark.createDataFrame(
        [(i, mk(negw)) for i in range(60)], "doc_id long, text string"
    )
    model = train_quality_classifier(pos, neg, iters=10)
    both = pos.select("doc_id", "text", F.lit(1).alias("y")).unionByName(
        neg.select((F.col("doc_id") + 1000).alias("doc_id"), "text", F.lit(0).alias("y"))
    )
    scores = score_quality(both, model)
    assert quality_auc(scores, both.select("doc_id", "y")) == 1.0
    # margin replay for one doc: python model over the engine's buckets
    doc = both.filter(F.col("doc_id") == 0)
    buckets = doc.select(
        F.explode(_gram_buckets("text", model["n_buckets"], model["salt"])).alias("b")
    ).collect()
    ws = sum(model["weights"].get(r["b"], 0.0) for r in buckets)
    expect = 1.0 / (1.0 + math.exp(-(ws / len(buckets) + model["bias"])))
    got = scores.filter(F.col("doc_id") == 0).collect()[0]["quality_score"]
    assert abs(got - expect) < 1e-12
    # empty doc scores sigmoid(bias) with n_grams 0
    e = score_quality(
        spark.createDataFrame([(9, "")], "doc_id long, text string"), model
    ).collect()[0]
    assert e["n_grams"] == 0
    assert abs(e["quality_score"] - 1.0 / (1.0 + math.exp(-model["bias"]))) < 1e-12


def test_fuzzy_join_completeness_and_plan(spark):
    """fuzzy_pairs == brute force for a mixed long/short corpus with
    known matches at every distance; asymmetric fuzzy_join works; and
    the plan has no corpus-level cross join (the short path's band
    join is an equi-join on __band)."""
    from daft_spark.operators.fuzzy import fuzzy_join, fuzzy_pairs

    rows = [
        (1, "johnathan smith"), (2, "jonathan smith"), (3, "jonathan smyth"),
        (4, "completely other"), (5, "abc"), (6, "abd"), (7, "ab"),
        (8, "johnathan smith"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = sorted(
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_pairs(df, "s", "doc_id", max_distance=2).collect()
    )

    def lev(a, b):
        import functools

        @functools.lru_cache(None)
        def d(i, j):
            if i == 0 or j == 0:
                return i + j
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    exp = sorted(
        (ia, ib, lev(sa, sb))
        for ia, sa in rows
        for ib, sb in rows
        if ia < ib and lev(sa, sb) <= 2
    )
    assert got == exp
    # exact duplicates appear at distance 0
    assert (1, 8, 0) in got
    # asymmetric two-frame join
    left = spark.createDataFrame([(10, "spark engine")], "id_a long, name string")
    right = spark.createDataFrame(
        [(20, "spark enjine"), (21, "flink engine")], "id_b long, nm string"
    )
    j = sorted(
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_join(left, right, "name", "nm", max_distance=1).collect()
    )
    assert j == [(10, 20, 1)]
    plan = fuzzy_pairs(df, "s", "doc_id", max_distance=1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_joins_match_python_model_and_plan(spark):
    """Binned range joins == the brute-force predicate for random
    intervals spanning many bins (exactly-once: result sizes equal,
    no duplicates), inclusive bounds honored, and no
    BroadcastNestedLoopJoin / CartesianProduct in either plan."""
    import random

    from daft_spark.operators.range_join import (
        interval_overlap_join,
        point_in_interval_join,
    )

    rng = random.Random(9)
    pts = [(i, rng.uniform(-50, 50)) for i in range(120)]
    ivs = []
    for j in range(40):
        lo = rng.uniform(-60, 50)
        ivs.append((j, lo, lo + rng.uniform(0, 25)))  # spans up to 5 bins
    p = spark.createDataFrame(pts, "pid long, x double")
    v = spark.createDataFrame(ivs, "vid long, lo double, hi double")
    out = point_in_interval_join(p, v, "x", "lo", "hi", bin_size=5.0)
    got = sorted((r["pid"], r["vid"]) for r in out.collect())
    exp = sorted(
        (pi, vi) for pi, x in pts for vi, lo, hi in ivs if lo <= x <= hi
    )
    assert got == exp  # equality of sorted MULTISETS => exactly-once
    # exclusive bounds
    p2 = spark.createDataFrame([(1, 5.0), (2, 7.0)], "pid long, x double")
    v2 = spark.createDataFrame([(9, 5.0, 7.0)], "vid long, lo double, hi double")
    assert point_in_interval_join(
        p2, v2, "x", "lo", "hi", 2.0, inclusive="neither"
    ).count() == 0
    assert point_in_interval_join(
        p2, v2, "x", "lo", "hi", 2.0, inclusive="left"
    ).collect()[0]["pid"] == 1
    # overlap join vs model
    lv = [(i, lo, lo + rng.uniform(0, 12)) for i, lo in
          ((i, rng.uniform(-40, 40)) for i in range(50))]
    rv = [(100 + i, lo, lo + rng.uniform(0, 12)) for i, lo in
          ((i, rng.uniform(-40, 40)) for i in range(50))]
    a = spark.createDataFrame(lv, "ida long, sa double, ea double")
    b = spark.createDataFrame(rv, "idb long, sb double, eb double")
    got2 = sorted(
        (r["ida"], r["idb"])
        for r in interval_overlap_join(a, b, "sa", "ea", "sb", "eb", 4.0).collect()
    )
    exp2 = sorted(
        (ia, ib)
        for ia, s1, e1 in lv
        for ib, s2, e2 in rv
        if s1 <= e2 and s2 <= e1
    )
    assert got2 == exp2
    for df in (out, interval_overlap_join(a, b, "sa", "ea", "sb", "eb", 4.0)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bin_size"):
        point_in_interval_join(p, v, "x", "lo", "hi", 0)
    with _pytest.raises(ValueError, match="colliding"):
        point_in_interval_join(p, p.withColumnRenamed("pid", "q"), "x", "x", "x", 1.0)


def test_lsh_banding_audit_bounds(spark):
    """Identical docs -> recall 1.0 (banding always pairs equal
    signatures); fully distinct docs -> zero truth, recall/precision
    degrade gracefully instead of dividing by zero."""
    from daft_spark.operators.dedup import lsh_banding_audit

    dup = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
        + [(10 + i, f"unique words only here {i} row txt") for i in range(3)],
        "doc_id long, text string",
    )
    row = lsh_banding_audit(
        dup, "text", "doc_id", threshold=0.9, shingle_k=1
    ).collect()[0]
    assert row["n_docs"] == 7
    assert row["n_true_pairs"] == 6  # the 4 identical docs' pairs
    assert row["n_found"] == 6 and row["recall"] == 1.0
    assert 0.0 <= row["precision"] <= 1.0

    distinct = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(5)],
        "doc_id long, text string",
    )
    row = lsh_banding_audit(
        distinct, "text", "doc_id", threshold=0.5, shingle_k=1
    ).collect()[0]
    assert row["n_true_pairs"] == 0
    assert row["recall"] == 1.0  # vacuous truth


def test_resolve_keep_best_policy(spark):
    """Keeper = max quality, min id on ties; singleton clusters keep
    themselves."""
    from daft_spark.operators.dedup import resolve_keep_best

    clustered = spark.createDataFrame(
        [
            (1, 100, 5),  # cluster 100: ids 1(q5), 2(q9), 3(q9)
            (2, 100, 9),
            (3, 100, 9),
            (7, 700, 1),  # singleton
        ],
        "doc_id long, cluster_id long, q long",
    )
    rows = {
        r["doc_id"]: r
        for r in resolve_keep_best(clustered, "q", "doc_id").collect()
    }
    assert rows[1]["keeper_id"] == 2 and not rows[1]["is_kept"]
    assert rows[2]["is_kept"]  # q=9 tie broken by min id
    assert not rows[3]["is_kept"]
    assert rows[7]["keeper_id"] == 7 and rows[7]["is_kept"]

    # String doc ids (URLs/hashes) — the r13 ADVICE case: the old
    # arithmetic-negation tiebreak raised AnalysisException here.
    str_clustered = spark.createDataFrame(
        [
            ("https://a.example/1", 100, 5),
            ("https://b.example/2", 100, 9),
            ("https://c.example/3", 100, 9),
            ("sha256:deadbeef", 700, 1),
        ],
        "doc_id string, cluster_id long, q long",
    )
    srows = {
        r["doc_id"]: r
        for r in resolve_keep_best(str_clustered, "q", "doc_id").collect()
    }
    assert srows["https://a.example/1"]["keeper_id"] == "https://b.example/2"
    assert srows["https://b.example/2"]["is_kept"]  # tie -> min string id
    assert not srows["https://c.example/3"]["is_kept"]
    assert srows["sha256:deadbeef"]["is_kept"]


def test_embedding_drift_audit_identity_and_shift(spark):
    """Identical slices -> centroid cosine 1.0 and equal norms; an
    orthogonal shift shows up as cosine << 1."""
    from daft_spark.operators.similarity import embedding_drift_audit

    a = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    same = embedding_drift_audit(a, a).collect()[0]
    assert same["centroid_cosine"] == 1.0
    assert same["mean_norm_a"] == same["mean_norm_b"] == 1.0
    b = spark.createDataFrame(
        [(i, [0.0, 2.0, 0.0, 0.0], 0) for i in range(3)],
        "vec_id long, embedding array<float>, label int",
    )
    rot = embedding_drift_audit(a, b).collect()[0]
    assert rot["centroid_cosine"] == 0.0
    assert rot["n_a"] == 4 and rot["n_b"] == 3
    assert rot["mean_norm_b"] == 2.0


def test_zipf_audit_detects_zipfian_text(spark):
    """A corpus drawn with true Zipf frequencies fits slope ~ -1; the
    audit must recover it (the alarm's calibration case)."""
    from daft_spark.operators.repetition import zipf_audit

    # token w{r} appears floor(1000/r) times -> exact Zipf, slope -1
    words = []
    for r in range(1, 51):
        words += [f"w{r:03d}"] * (1000 // r)
    docs = [
        (i, " ".join(words[i * 120:(i + 1) * 120]))
        for i in range((len(words) + 119) // 120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = zipf_audit(df, "text", "doc_id", top_k=50).collect()[0]
    assert row["top_k"] == 50
    assert -1.05 <= row["zipf_slope"] <= -0.93, row
    assert row["zipf_r2"] > 0.97


def test_index_refresh_decision_triggers(spark):
    """Each trigger fires independently and composes in the reason
    string; identical slices reuse."""
    from daft_spark.operators.similarity import index_refresh_decision

    base = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0], "a") for i in range(10)]
        + [(i + 10, [0.0, 1.0, 0.0], "b") for i in range(10)]
        + [(i + 20, [0.0, 0.0, 1.0], "c") for i in range(10)]
        + [(i + 30, [1.0, 1.0, 0.0], "d") for i in range(10)],
        "vec_id long, embedding array<float>, label string",
    )
    # a: identical -> reuse; b: orthogonal rotation; c: 2x norm scale;
    # d: 30 incoming vs 10 indexed -> growth
    cur = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0], "a") for i in range(10)]
        + [(i + 10, [1.0, 0.0, 0.0], "b") for i in range(10)]
        + [(i + 20, [0.0, 0.0, 2.0], "c") for i in range(10)]
        + [(i + 30, [1.0, 1.0, 0.0], "d") for i in range(30)],
        "vec_id long, embedding array<float>, label string",
    )
    rows = {
        r["label"]: r
        for r in index_refresh_decision(base, cur, "embedding", "label")
        .collect()
    }
    assert not rows["a"]["rebuild"] and rows["a"]["reason"] == "none"
    assert rows["b"]["reason"] == "centroid_rotation"
    assert rows["c"]["reason"] == "norm_shift"
    assert rows["c"]["norm_ratio"] == 2.0
    assert rows["d"]["reason"] == "growth"
    assert rows["d"]["growth_ratio"] == 3.0


def test_index_refresh_report_per_list(spark, tmp_path):
    """Against a STORED index: an append-shaped batch reuses; a
    re-scaled batch flags norm_shift on the lists it routes to."""
    from daft_spark.operators.ann_index import (
        build_ivf_index,
        index_refresh_report,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i % 4 == 0), float(i % 4 == 1),
              float(i % 4 == 2), float(i % 4 == 3)]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, num_centroids=4, kind="ivf")

    same = corpus.withColumn("vec_id", F.col("vec_id") + 1000)
    rep = index_refresh_report(spark, path, same)
    assert rep.filter(F.col("rebuild")).count() == 0

    scaled = corpus.selectExpr(
        "vec_id + 2000 as vec_id",
        "transform(embedding, x -> x * CAST(1.5 AS FLOAT)) as embedding",
    )
    rep2 = index_refresh_report(spark, path, scaled)
    bad = rep2.filter(F.col("rebuild")).collect()
    assert bad and all("norm_shift" in r["reason"] for r in bad)


def test_pack_efficiency_audit_hand_case(spark):
    """seq_len=10, single stream: 3 docs of 6 tokens each (incl. EOD)
    -> total 18, 2 sequences, fill 0.9; exactly one doc straddles the
    10-boundary losing 2 tokens to a truncate-at-boundary loader."""
    from daft_spark.operators.sampling import pack_efficiency_audit

    docs = spark.createDataFrame(
        [(i, "t1 t2 t3 t4 t5", "s") for i in range(3)],
        "doc_id long, text string, source string",
    )
    row = pack_efficiency_audit(
        docs, "text", "doc_id", seq_len=10, eod_tokens=1, by=["source"]
    ).collect()[0]
    assert row["n_docs"] == 3 and row["total_tokens"] == 18
    assert row["n_sequences"] == 2
    assert abs(row["fill_rate"] - 0.9) < 1e-9
    # placements: [0,6) [6,12) [12,18) -> the middle doc straddles seq 0/1
    assert row["n_straddling"] == 1 and row["n_span2"] == 1
    assert row["n_span1"] == 2 and row["n_span3plus"] == 0
    assert row["trunc_loss_tokens"] == 2
    assert abs(row["trunc_loss_rate"] - 2 / 18) < 1e-6


def test_quality_shift_report_hand_case(spark):
    """Two exact copies of a low-quality doc + one unique high-quality
    doc in source s1: the removed copy's stats isolate cleanly."""
    from daft_spark.operators.dedup import quality_shift_report

    df = spark.createDataFrame(
        [
            (1, "s1", "dup dup", 0.25),
            (2, "s1", "dup dup", 0.25),   # removed (min-id keeper)
            (3, "s1", "unique good", 0.75),
            (4, "s2", "only one", 0.5),
        ],
        "doc_id long, source string, text string, q double",
    )
    rows = {
        r["source"]: r
        for r in quality_shift_report(df, "text", "doc_id", "q",
                                      by=["source"]).collect()
    }
    s1 = rows["s1"]
    assert s1["n_docs"] == 3 and s1["n_kept"] == 2 and s1["n_removed"] == 1
    assert abs(s1["removal_rate"] - 1 / 3) < 1e-6
    assert s1["q_kept_avg"] == 0.5 and s1["q_removed_avg"] == 0.25
    s2 = rows["s2"]
    assert s2["n_removed"] == 0 and s2["q_removed_avg"] is None


def test_semdedup_sweep_hand_case(spark):
    """3 vectors in one block: v1 || v2 (cos 1), v3 orthogonal. At any
    threshold <= 1 only v2 is removed (lower-id keeper v1)."""
    from daft_spark.operators.similarity import semdedup_sweep

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [2.0, 0.0], 0),   # cos(v1,v2)=1 -> removed
            (3, [0.0, 1.0], 0),
            (4, [1.0, 1.0], 1),   # alone in its block
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        r["threshold"]: r
        for r in semdedup_sweep(df, [0.5, 0.9], block_col="label").collect()
    }
    for t in (0.5, 0.9):
        assert rows[t]["n_total"] == 4
        assert rows[t]["n_removed"] == 1 and rows[t]["n_kept"] == 3
        assert abs(rows[t]["removal_rate"] - 0.25) < 1e-9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        semdedup_sweep(df, [])


def test_winnow_threshold_sweep_hand_case(spark):
    """Docs 1 and 2 are exact copies (fingerprint Jaccard 1.0), doc 3
    is unique: one removal at every threshold <= 1.0."""
    from daft_spark.operators.winnow import winnow_threshold_sweep

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different content with no shared runs at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["threshold"]: r
        for r in winnow_threshold_sweep(df, [0.5, 1.0]).collect()
    }
    for t in (0.5, 1.0):
        assert rows[t]["n_total"] == 3
        assert rows[t]["n_removed"] == 1 and rows[t]["n_kept"] == 2
        assert abs(rows[t]["removal_rate"] - 1 / 3) < 1e-6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winnow_threshold_sweep(df, [])


def test_source_overlap_matrix_hand_case(spark):
    """s1 and s2 carry the same text (full overlap); s3 is disjoint —
    exactly one matrix row, containment = jaccard = 1.0."""
    from daft_spark.operators.winnow import source_overlap_matrix

    df = spark.createDataFrame(
        [
            (1, "s1", "the quick brown fox jumps over the lazy dog"),
            (2, "s2", "the quick brown fox jumps over the lazy dog"),
            (3, "s3", "completely different content with no shared runs"),
        ],
        "doc_id long, source string, text string",
    )
    rows = source_overlap_matrix(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["fps_a"] == r["fps_b"] == r["shared_fps"] > 0
    assert r["containment"] == 1.0 and r["jaccard"] == 1.0


def test_novelty_report_hand_case(spark):
    """Doc 2 re-fingerprints doc 1 exactly (novelty 0); docs 1 and 3
    are first occurrences (novelty 1)."""
    from daft_spark.operators.winnow import novelty_report

    df = spark.createDataFrame(
        [
            (1, "a", "the quick brown fox jumps over the lazy dog"),
            (2, "a", "the quick brown fox jumps over the lazy dog"),
            (3, "b", "completely different content with no shared runs"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in novelty_report(df).collect()}
    a = rows["a"]
    assert a["n_docs"] == 2
    assert abs(a["avg_novelty"] - 0.5) < 1e-6
    assert a["n_fully_novel"] == 1 and a["n_fully_stale"] == 1
    b = rows["b"]
    assert b["n_docs"] == 1 and b["avg_novelty"] == 1.0
    assert b["n_fully_novel"] == 1 and b["n_fully_stale"] == 0


def test_shard_manifest_hand_case(spark):
    """Counts are conserved across shards and shares sum to 1."""
    from daft_spark.operators.sampling import shard_manifest

    df = spark.createDataFrame(
        [(i, f"tok{i} word another") for i in range(20)],
        "doc_id long, text string",
    )
    rows = shard_manifest(df, "text", "doc_id", n_shards=4).collect()
    assert all(0 <= r["shard"] < 4 for r in rows)
    assert sum(r["n_docs"] for r in rows) == 20
    assert sum(r["n_tokens"] for r in rows) == 60
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-5


def test_vocab_growth_hand_case(spark):
    """Vocabulary accumulates by first occurrence: docs 1-2 carry
    {a,b,c}, doc 4 adds d."""
    from daft_spark.operators.repetition import vocab_growth

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a b"), (4, "d")],
        "doc_id long, text string",
    )
    rows = {
        r["fraction"]: r
        for r in vocab_growth(df, fractions=[0.5, 1.0]).collect()
    }
    h = rows[0.5]
    assert h["cutoff_id"] == 2 and h["n_docs"] == 2
    assert h["n_tokens"] == 4 and h["n_vocab"] == 3
    assert abs(h["type_token_ratio"] - 0.75) < 1e-9
    f = rows[1.0]
    assert f["cutoff_id"] == 4 and f["n_docs"] == 4
    assert f["n_tokens"] == 7 and f["n_vocab"] == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_growth(df, fractions=[0.0, 2.0])


def test_quantization_distortion_hand_case(spark):
    """A vector that quantizes exactly has fidelity 1.0 / error 0;
    zero vectors are excluded; every error is bounded by scale/2."""
    from daft_spark.operators.similarity import (
        quantization_distortion_report,
    )

    df = spark.createDataFrame(
        [
            (1, [127.0, 0.0], "a"),     # exact: scale 1, qv [127, 0]
            (2, [0.0, 0.0], "a"),       # zero vector -> excluded
            (3, [100.0, 0.5], "b"),     # inexact second element
        ],
        "vec_id long, embedding array<float>, label string",
    )
    rows = {r["label"]: r for r in
            quantization_distortion_report(df).collect()}
    a = rows["a"]
    assert a["n_vecs"] == 1
    assert a["avg_fidelity"] == 1.0 and a["min_fidelity"] == 1.0
    assert a["max_abs_err"] == 0.0
    b = rows["b"]
    assert b["n_vecs"] == 1
    assert 0.9 < b["min_fidelity"] < 1.0
    # per-element error bounded by scale/2 = (100/127)/2
    assert b["max_abs_err"] <= (100.0 / 127.0) / 2 + 1e-9


def test_last_touch_attribution_hand_case(spark):
    """In-window touch credits; stale touch and no-touch fall to
    'unattributed'; latency is the whole-second gap."""
    import datetime as dt

    from daft_spark.operators.funnel import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            (1, at(0), 1, "view", 0.0),
            (2, at(100), 1, "purchase", 10.0),   # view 100s ago -> view
            (3, at(200), 1, "click", 0.0),
            (4, at(500), 1, "purchase", 20.0),   # click 300s ago -> click
            (5, at(0), 2, "purchase", 5.0),      # no touch -> unattributed
            (6, at(0), 3, "view", 0.0),
            (7, at(5000), 3, "purchase", 7.0),   # stale -> unattributed
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    rows = {
        r["channel"]: r
        for r in last_touch_attribution(
            df, ["view", "click"], "purchase", 3600
        ).collect()
    }
    assert rows["view"]["n_conversions"] == 1
    assert rows["view"]["revenue"] == 10.0
    assert rows["view"]["avg_latency_sec"] == 100.0
    assert rows["click"]["n_conversions"] == 1
    assert rows["click"]["avg_latency_sec"] == 300.0
    u = rows["unattributed"]
    assert u["n_conversions"] == 2 and u["revenue"] == 12.0
    assert u["avg_latency_sec"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        last_touch_attribution(df, ["view", "purchase"], "purchase", 60)


def test_miner_broadcast_guards_fall_back_above_limit(spark, monkeypatch):
    """r15 (verdict task 3): the two forced broadcasts inside the
    miners — oversized-bucket reps in _capped_bucket_pairs and hot
    stop-shingles in containment_pairs — are bounded BY CONSTRUCTION:
    the frame is counted first and only broadcasts under
    _BROADCAST_KEY_LIMIT rows. With the limit forced to 0 both take the
    shuffle-join fallback (no broadcast HINT in the analyzed plan —
    Spark's own auto-broadcast below autoBroadcastJoinThreshold stays
    legal and is bounded by that conf) and the pair sets are
    identical."""
    import daft_spark.operators.dedup as dd
    from daft_spark.io.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")

    def containment():
        # low cap so the hot stop-shingle set is non-empty
        return dd.containment_pairs(
            docs, "text", "doc_id", threshold=0.5, max_doc_freq=5
        ).select("id_a", "id_b")

    def lsh():
        # max_bucket_size=1 forces every shared bucket oversized, so the
        # guarded oversized-rep frame is non-empty
        return dd.minhash_lsh_candidates(
            docs, "text", "doc_id", num_hashes=16, bands=8, max_bucket_size=1
        )

    def rows(df):
        return {tuple(r) for r in df.collect()}

    def hinted(df):
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    base_cont, base_lsh = containment(), lsh()
    assert hinted(base_cont) and hinted(base_lsh)  # default: broadcast path
    got_cont, got_lsh = rows(base_cont), rows(base_lsh)
    assert got_cont and got_lsh  # non-trivial fixtures

    spark.catalog.clearCache()
    monkeypatch.setattr(dd, "_BROADCAST_KEY_LIMIT", 0)
    fb_cont, fb_lsh = containment(), lsh()
    assert not hinted(fb_cont) and not hinted(fb_lsh)  # fallback: no forced hint
    assert rows(fb_cont) == got_cont
    assert rows(fb_lsh) == got_lsh
    spark.catalog.clearCache()


def test_verify_prune_decision_record(spark):
    """r15 (verdict task 1): the verify-side semi-join prune was tried
    and REVERTED (documented NO at every locally measurable
    configuration — probes/VERIFY_PRUNE_AB_*_r15.json). This pin keeps
    the shipped verify shape honest: the miner plans NO LeftSemi join
    (the reverted prune's signature), and the decision record stays in
    the module so the revert cannot silently un-document itself."""
    import daft_spark.operators.dedup as dd
    from daft_spark.io.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = dd.minhash_near_dups(
        docs, "text", "doc_id", num_hashes=16, bands=8, threshold=0.5
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" not in plan
    import inspect

    src = inspect.getsource(dd)
    assert "TRIED AND REVERTED" in src  # decision record present
