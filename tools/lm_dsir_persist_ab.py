"""Interleaved A/B: the r14 persist() of the reduced count frames in
bigram_lm_scores (per_doc, c12) and dsir_log_weights (p, q) vs the
pre-r14 no-persist formulation, measured with bench.py's own
materialization (toArrow of the full ordered result).

Motivation: the r14 commit adopted the persists on a HEAVILY loaded
host where sf0.1 timing was noise-bound ("sf0.1 neutral"); the first
quiet-host close bench then showed text_lm_perplexity ~3.6 s vs the
r13 ~2.2 s — suspicion: at sf0.1 the cache fill SERIALIZES stages that
previously ran concurrently (4 short independent scan branches across
32 cores), so the persist trades wall-clock at tiny scale for the
2-scan floor that wins at sf1+. This probe measures both arms
interleaved in one session per SF so the trade is on the record.

Usage: python tools/lm_dsir_persist_ab.py [sf_dir] [passes]
Writes probes/LM_DSIR_PERSIST_AB_r14.json (merged per-sf_dir keys).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _lm_scores(df, persist: bool, k: float = 0.5):
    """bigram_lm_scores with the persist toggleable (mirror of
    operators/lm.py; OLD arm = the pre-fabd139 formulation)."""
    base = df.select(
        F.col("doc_id"),
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__arr"),
    )
    bigrams = (
        base.select("doc_id", "__arr", F.posexplode("__arr").alias("__ord", "__w1"))
        .select("doc_id", "__w1", F.get("__arr", F.col("__ord") + 1).alias("__w2"))
        .filter((F.col("__w1") != "") & F.col("__w2").isNotNull() & (F.col("__w2") != ""))
    )
    toks = base.select(F.explode("__arr").alias("__tok")).filter(F.col("__tok") != "")
    per_doc = bigrams.groupBy("doc_id", "__w1", "__w2").agg(
        F.count(F.lit(1)).alias("__n")
    )
    if persist:
        per_doc = per_doc.persist()
    c12 = per_doc.groupBy("__w1", "__w2").agg(F.sum("__n").alias("__c12"))
    if persist:
        c12 = c12.persist()
    c1 = c12.groupBy("__w1").agg(F.sum("__c12").alias("__c1"))
    vocab = toks.select(F.countDistinct("__tok").alias("__v"))
    logp = F.round(
        F.log((F.col("__c12") + F.lit(k)) / (F.col("__c1") + F.lit(k) * F.col("__v"))), 9
    ).cast("decimal(28,9)")
    scored = (
        per_doc.join(c12, ["__w1", "__w2"])
        .join(c1, ["__w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("__n").alias("n_bigrams"),
            F.sum(F.col("__n").cast("decimal(9,0)") * logp).alias("__lsum"),
        )
    )
    avg_lp = F.round(F.col("__lsum").cast("double") / F.col("n_bigrams"), 6)
    return scored.select(
        "doc_id", "n_bigrams", avg_lp.alias("avg_logprob"),
        F.round(F.exp(-avg_lp), 4).alias("perplexity"),
    ).orderBy("doc_id")


def _dsir(raw, target, persist: bool, n_buckets: int = 1024,
          alpha: float = 1e-2, salt: str = "dsir"):
    """dsir_log_weights body (operators/dsir.py) with the p/q persist
    toggleable — OLD arm = the pre-fabd139 formulation."""
    from daft_spark.operators.dsir import _bucket_counts, _gram_buckets

    p = _bucket_counts(target, "text", n_buckets, salt)
    q = _bucket_counts(raw, "text", n_buckets, salt)
    if persist:
        p, q = p.persist(), q.persist()
    totals = p.agg(F.sum("cnt").alias("np")).crossJoin(
        q.agg(F.sum("cnt").alias("nq"))
    )
    ratio = (
        q.join(p.withColumnRenamed("cnt", "cnt_p"), "bucket", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_p"), F.lit(0)) + F.lit(alpha))
                    / (F.col("np") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                    / (F.col("nq") + F.lit(alpha * n_buckets))
                )
            ).alias("log_ratio"),
        )
    )
    grams = raw.select(
        F.col("doc_id"),
        F.explode_outer(_gram_buckets("text", n_buckets, salt)).alias("bucket"),
    )
    return (
        grams.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("bucket")).alias("n_grams"),
            F.round(
                F.coalesce(F.sum("log_ratio"), F.lit(0.0)), 6
            ).alias("log_weight"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table

    spark = get_or_create(app_name="lm_dsir_persist_ab")
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")  # == pipeline_dsir_weights

    def _mat(df):
        t0 = time.perf_counter()
        df.toArrow()
        return round(time.perf_counter() - t0, 3)

    out = {"sf_dir": sf_dir, "passes": passes, "lm": {"old": [], "new": []},
           "dsir": {"old": [], "new": []}}
    # warm-up pass (JVM + codegen), not recorded
    _mat(_lm_scores(docs, persist=False))
    release_caches(spark)
    for i in range(passes):
        for arm, persist in (("old", False), ("new", True)) if i % 2 == 0 else (
            ("new", True), ("old", False)
        ):
            spark.sparkContext.setJobDescription(f"lm_{arm}_pass{i}")
            out["lm"][arm].append(_mat(_lm_scores(docs, persist=persist)))
            release_caches(spark)
    for i in range(passes):
        for arm, persist in (("old", False), ("new", True)) if i % 2 == 0 else (
            ("new", True), ("old", False)
        ):
            spark.sparkContext.setJobDescription(f"dsir_{arm}_pass{i}")
            out["dsir"][arm].append(_mat(_dsir(docs, target, persist=persist)))
            release_caches(spark)
    for op in ("lm", "dsir"):
        for arm in ("old", "new"):
            runs = out[op][arm]
            out[op][f"{arm}_min"] = min(runs)
            out[op][f"{arm}_med"] = sorted(runs)[len(runs) // 2]
    path = os.path.join(REPO, "probes", "LM_DSIR_PERSIST_AB_r14.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    merged[f"{os.path.basename(sf_dir.rstrip('/'))}_c{cpus}"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
