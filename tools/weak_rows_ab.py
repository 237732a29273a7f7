"""w_running_agg + pipeline_mix_split_pack decomposition at sf1/sf10
(r13 verdict task 5) — same protocol as the dedup_exact decomposition
(probes/DEDUP_EXACT_AB_r13.json): where does the time go (scan /
operator / presentation sort / driver collect), and is there a plan
lever worth taking?

Arms per query (warm best-of-2 after a cold pass, clearCache between):

  full_collect    — the registered row exactly as the driver runs it
  nosort_forced   — registered plan minus the presentation orderBy,
                    forced with bit_xor(xxhash64(...)) (no driver
                    materialization)
  <query-specific decomposition arms, see below>
  duckdb          — the registered oracle timed in DuckDB

w_running_agg extra arms:
  scan_forced        — the events scan + projection alone
  window_dbl_forced  — the same window over raw DOUBLE instead of the
                       DECIMAL(18,2) accumulator the oracle-exactness
                       contract requires (prices the exactness tax)

pipeline_mix_split_pack extra arms:
  tokens_forced      — scan + token_count regex only (the CPU stage)
  nopack_forced      — mixture + split, stopping before the packing
                       window

Usage: python tools/weak_rows_ab.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {"sf1": "/tmp/spark_graft_sf1", "sf10": "/tmp/spark_graft_sf10"}


def _timed(fn, release) -> float:
    fn()
    release()
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
        release()
    return min(times)


def _duck(sql: str, sf_dir: str) -> float:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(
            f"create view {t} as select * from read_parquet('{p}')"
        )
    con.execute(sql).fetchall()
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times)


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "WEAK_ROWS_AB_r14.json",
        )
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.io.readers import load_table
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="weak_rows_ab", master="local[32]")
    release = lambda: release_caches(spark)  # noqa: E731
    reg = all_queries()

    def force(df, *cols):
        df.agg(F.bit_xor(F.xxhash64(*cols))).collect()

    results: dict = {
        "experiment": "w_running_agg + pipeline_mix_split_pack "
                      "decomposition (r13 verdict task 5)",
        "method": "cold pass then min of 2 warm, clearCache between, "
                  "local[32]; forced arms use bit_xor(xxhash64)",
    }
    for tag, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        blk: dict = {"w_running_agg": {}, "pipeline_mix_split_pack": {}}

        # ---- w_running_agg ----
        w_spec = reg["w_running_agg"]
        r = blk["w_running_agg"]
        r["full_collect"] = _timed(
            lambda: w_spec.spark_fn(spark, sf_dir).collect(), release
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def nosort():
            e = load_table(spark, sf_dir, "events")
            sum_dec = (
                F.sum(F.col("value").cast("decimal(18,2)")).over(w)
                .cast("double")
            )
            out = e.select(
                "event_id",
                sum_dec.alias("run_sum"),
                F.round(sum_dec / F.count("value").over(w), 6).alias("run_avg"),
                F.count("value").over(w).alias("run_cnt"),
                F.min("value").over(w).alias("run_min"),
                F.max("value").over(w).alias("run_max"),
            )
            force(out, "event_id", "run_sum", "run_avg", "run_cnt",
                  "run_min", "run_max")

        def window_dbl():
            e = load_table(spark, sf_dir, "events")
            s = F.sum("value").over(w)
            out = e.select(
                "event_id",
                s.alias("run_sum"),
                F.count("value").over(w).alias("run_cnt"),
                F.min("value").over(w).alias("run_min"),
                F.max("value").over(w).alias("run_max"),
            )
            force(out, "event_id", "run_sum", "run_cnt", "run_min", "run_max")

        def scan_only():
            e = load_table(spark, sf_dir, "events").select(
                "event_id", "user_id", "ts", "value"
            )
            force(e, "event_id", "user_id", "value")

        r["nosort_forced"] = _timed(nosort, release)
        r["window_dbl_forced"] = _timed(window_dbl, release)
        r["scan_forced"] = _timed(scan_only, release)
        r["duckdb"] = _duck(w_spec.oracle, sf_dir)
        print(f"# {tag} w_running_agg: {r}", file=sys.stderr)

        # ---- pipeline_mix_split_pack ----
        m_spec = reg["pipeline_mix_split_pack"]
        r = blk["pipeline_mix_split_pack"]
        r["full_collect"] = _timed(
            lambda: m_spec.spark_fn(spark, sf_dir).collect(), release
        )

        from daft_spark.functions.text import token_count
        from daft_spark.operators.sampling import (
            apply_mixture,
            hash_split,
            mixture_weights,
            pack_sequences,
        )
        from daft_spark.operators.spread import spread

        def docs():
            return spread(load_table(spark, sf_dir, "documents")).select(
                "doc_id", "source", "text",
                token_count(F.col("text")).cast("double").alias("toks"),
            )

        def staged(stop):
            d = docs()
            if stop == "tokens":
                force(d, "doc_id", "toks")
                return
            rates = mixture_weights(
                d, ["source"],
                {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
                weight_col="toks",
            )
            kept = apply_mixture(d, rates, ["source"], id_col="doc_id",
                                 salt="mix10")
            sp = hash_split(kept, {"train": 0.9, "val": 0.1},
                            id_col="doc_id", salt="sp10")
            if stop == "nopack":
                force(sp, "doc_id", "split")
                return
            out = pack_sequences(sp, "text", "doc_id", seq_len=512,
                                 eod_tokens=1, by=["split", "source"])
            force(out, "doc_id", "n_tokens", "start_offset", "first_seq",
                  "last_seq")

        r["nosort_forced"] = _timed(lambda: staged("all"), release)
        r["nopack_forced"] = _timed(lambda: staged("nopack"), release)
        r["tokens_forced"] = _timed(lambda: staged("tokens"), release)
        r["duckdb"] = _duck(m_spec.oracle, sf_dir)
        print(f"# {tag} pipeline_mix_split_pack: {r}", file=sys.stderr)

        results[tag] = blk
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
