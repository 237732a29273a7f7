"""Benchmark harness — runs the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE COMPACT JSON line LAST:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The compact line carries only the headline numbers (per-query medians,
totals, ratios); every bulky detail — raw passes, DuckDB per-pass
times, LSH stage accounting, sf1/sf10 scale blocks, prose notes — goes
to the BENCH_DETAIL.json sidecar next to this file. Round 5's driver
artifact was unparseable because the single line embedded all of that
and got tail-truncated; the compact-last-line contract fixes it.

Measurement discipline (round-5 rework, tightened after observing the
sandbox's bursty contention): one cold pass (JVM warm-up + codegen +
parquet footers, reported separately), then ``N`` warm passes per
query with ``release_caches`` between every pass. The per-query number
is the MEDIAN of the warm passes and every raw pass is emitted
(``passes``) so run-to-run variance is visible.

The DuckDB reference is measured in TIME-ADJACENT PAIRS: within each
warm sweep, every query's Spark pass is immediately followed by its
DuckDB pass, so a contention burst hits both engines at the same
instant and the per-pass ratio stays meaningful even when absolute
times spike (round 4 measured identical code 4.6x slower than round 3
because a single back-to-back phase absorbed a burst asymmetrically).
``min`` per query is also emitted — under bursty external load the
minimum is the best available estimate of the code's intrinsic cost.

Counterpart of the reference's local benchmark harness
(reference: tests/benchmarks/test_local_tpch.py, conftest.py SCALE_FACTOR=0.2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WARM_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
# Precomputed large-scale results (tools/run_scale_bench.py writes this);
# embedded verbatim so the per-round artifact carries the sf1 ratio.
SF1_RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SF1_RESULTS.json")

# Headline set: relational core + windows + custom operators. Kept in
# rough cost order so failures surface early.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "w_running_agg",
    "asof_backward_by",
    "dedup_exact",
    "dedup_minhash_lsh_pipeline",
    "dedup_resolve",
    # r12 addition (r11 verdict task 6): the dedup-RESOLUTION row with a
    # genuinely comparable DuckDB reference — same exact-collapse +
    # containment-edge mining + connected components, replayed by the
    # oracle as a recursive CTE. dedup_resolve (minhash) stays in the
    # mix for r6-r11 continuity but its banding is probabilistic, so
    # its oracle is invariant-only (rows-only stat, excluded from the
    # ratio); this row gives the dedup family a paired ratio.
    "dedup_resolve_containment",
    # dedup_embedding_resolve/lsh stay OUT of the headline: both are
    # VALIDATION queries that compute the exact label-blocked pair set
    # (the resolve's oracle contract; the lsh query additionally mines
    # exact ground truth to measure recall), so their cost is quadratic
    # in per-label population by design — at sf1 the exact pass alone
    # is ~80 s and swamps the suite total (measured 2026-08-14). The
    # oracle gate covers their correctness; the banded SRP-LSH miner
    # (operators/similarity.embedding_near_dups) is the scale path.
    "text_quality",
    "sim_topk_cosine",
    # r9 addition: the corpus-trained bigram-LM scorer (skew-hardened
    # per-doc-count joins). Standalone idle A/B at sf0.1 before
    # inclusion: spark [2.773, 2.064, 2.293] vs duckdb [0.68, 0.74,
    # 0.619] = 3.37x — at the suite's published paired ratio, so the
    # headline total stays interpretable round over round.
    "text_lm_perplexity",
    # r11 additions (r10 verdict task 5; idle A/B receipts in
    # probes/PIPELINE_HEADLINE_AB_r11.json). mix_split_pack is the
    # verdict's named selection-to-layout composition — 8.6x at sf0.1
    # is 7 stages of fixed cost over 0.23 s of DuckDB work; included
    # FOR the sf1/sf10 scale curve (the window moves (id, n_tokens)
    # keys only). dsir_weights is the new DSIR family's data-heavy
    # representative at 0.98x parity. Old-mix totals remain
    # recomputable: sum the per-query medians over the r10 HEADLINE
    # names (these two appended last).
    "pipeline_mix_split_pack",
    "pipeline_dsir_weights",
]


# Bench-side overrides: queries whose REGISTRY entry is an invariant
# summary (the driver-correctness shape) but whose bench entry must keep
# measuring the same raw work as prior rounds. dedup_minhash_lsh_pipeline's
# registry fn reduces to invariant booleans since r10; the headline entry
# stays the raw-pairs materialization (identical params + orderBy) so the
# suite mix is comparable r6 -> r10.
def _lsh_pipeline_raw(spark, sf_dir):
    from daft_spark.io.readers import load_table
    from daft_spark.operators.dedup import minhash_near_dups

    return minhash_near_dups(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        num_hashes=64, bands=16, threshold=0.5,
    ).orderBy("id_a", "id_b")


BENCH_OVERRIDES = {"dedup_minhash_lsh_pipeline": _lsh_pipeline_raw}


def main() -> None:
    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    spark = get_or_create(app_name="daft_spark_bench", master=f"local[{CPUS}]")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    def bench_fn(name):
        return BENCH_OVERRIDES.get(name, registry[name].spark_fn)
    duck = _duckdb_connect()

    # Cold pass: JVM warm-up + codegen + parquet footers (recorded as
    # cold_total). Caches persisted inside one query's plan must not
    # leak into the next query's executor storage (eviction churn +
    # GC distort timings), so release_caches runs between every pass.
    #
    # Both engines materialize results as Arrow (Spark toArrow, DuckDB
    # .arrow()): the query's full result must land in driver memory in
    # columnar form. Per-row Python object construction (collect /
    # fetchall) measures the client binding, not the engine.
    cold_total = 0.0
    failed: set[str] = set()
    dfailed: set[str] = set()
    for name in names:
        t0 = time.perf_counter()
        try:
            _materialize(bench_fn(name)(spark, SF_DIR))
            cold_total += time.perf_counter() - t0
        except Exception as e:
            print(f"# bench {name} FAILED (cold): {e}", file=sys.stderr)
            failed.add(name)
        release_caches(spark)
        # Invariant (comparable=False) oracles are correctness harnesses,
        # not the same work — excluded from the ratio, so don't run them.
        oracle = registry[name].oracle if registry[name].comparable else None
        if oracle is not None:
            try:
                duck.execute(oracle).arrow()  # duckdb cold (buffers + plan cache)
            except Exception as e:
                print(f"# bench duckdb {name} FAILED (cold): {e}", file=sys.stderr)
                dfailed.add(name)

    # Warm passes: interleave full sweeps (pass 1 of every query, then
    # pass 2, ...) rather than back-to-back repeats of one query, so a
    # transient contention spike hits one pass of many queries instead
    # of all passes of one — the median then rejects it. Each Spark
    # pass is immediately followed by the SAME query's DuckDB pass
    # (time-adjacent pairing) so per-pass ratios share ambient load.
    #
    # A full JVM GC runs between sweeps: the r11 headline additions
    # materialize tens of millions of gram rows at sf1/sf10, and the
    # garbage they leave at the END of sweep i taxed the EARLY queries
    # of sweep i+1 (r11 measurement: r8-mix per-sweep ratios
    # [3.06, 4.04, 3.36] at sf10 — sweep 0 matches r10's 3.02, later
    # sweeps inflate). Collecting between sweeps makes each sweep
    # measure its own queries' cost, not its predecessor's garbage.
    passes: dict[str, list[float]] = {n: [] for n in names}
    dpasses: dict[str, list[float]] = {}
    for _ in range(WARM_PASSES):
        _jvm_gc(spark)
        for name in names:
            if name not in failed:
                t0 = time.perf_counter()
                try:
                    _materialize(bench_fn(name)(spark, SF_DIR))
                    passes[name].append(round(time.perf_counter() - t0, 3))
                except Exception as e:
                    print(f"# bench {name} FAILED: {e}", file=sys.stderr)
                    failed.add(name)
                release_caches(spark)
            oracle = registry[name].oracle if registry[name].comparable else None
            if oracle is None or name in failed or name in dfailed:
                continue  # non-SQL-expressible or invariant-only — excluded
            t0 = time.perf_counter()
            try:
                duck.execute(oracle).arrow()
                dpasses.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
            except Exception as e:
                print(f"# bench duckdb {name} FAILED: {e}", file=sys.stderr)
                dfailed.add(name)

    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    total = 0.0
    min_total = 0.0
    for name in names:
        if name in failed or not passes[name]:
            timings[name] = -1.0
            continue
        med = statistics.median(passes[name])
        timings[name] = round(med, 3)
        mins[name] = min(passes[name])
        total += med
        min_total += mins[name]

    # Like-for-like local reference: DuckDB (the correctness oracle) runs
    # the SAME queries on the SAME parquet at the SAME scale factor and
    # thread count, with the same median-of-N discipline. The reference's
    # own published numbers are cluster SF100/SF1000 (BASELINE.md) — not
    # comparable at this SF — and its wheel is not installable in this
    # container, so DuckDB, a state-of-the-art single-node vectorized
    # engine, is the honest local stand-in. ratio = ours / duckdb over
    # the oracled headline queries; paired_ratio uses per-pass
    # time-adjacent pairs (robust to bursty ambient load).
    comparable = {n for n in names if registry[n].comparable}
    vs_ref = _reference_block(passes, dpasses, timings, comparable)

    # Per-stage accounting for the suite's most expensive entry (the
    # LSH pipeline): rows + seconds for docs -> shingle hashes ->
    # signatures -> candidate pairs -> verified pairs, so its bench
    # number is explainable rather than a single opaque total.
    lsh_stages = None
    try:
        from daft_spark.io.readers import load_table
        from daft_spark.operators.dedup import minhash_lsh_stage_counts

        lsh_stages = minhash_lsh_stage_counts(
            load_table(spark, SF_DIR, "documents"), "text", "doc_id",
            num_hashes=64, bands=16, threshold=0.5,
        )
        release_caches(spark)
    except Exception as e:
        print(f"# bench lsh_stages FAILED: {e}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # Sidecar: every bulky detail (raw passes, duckdb per-pass, LSH
    # stage table, scale-run blocks, notes) so the stdout line stays
    # small enough for the driver's tail capture.
    detail = {
        "passes": passes,
        "min_sec": mins,
        "vs_local_reference": vs_ref,
    }
    if lsh_stages is not None:
        detail["lsh_stages"] = lsh_stages
    scale = _load_scale_runs()
    scale_summary = {}
    if scale is not None:
        for key in ("sf1", "sf10"):
            if key in scale:
                detail[key] = scale[key]
                blk = scale[key]
                scale_summary[key] = {
                    "suite_sec": blk.get("value"),
                    "ratio": (blk.get("vs_local_reference") or {}).get("ratio"),
                    "paired_ratio_suite": (blk.get("vs_local_reference") or {}).get(
                        "paired_ratio_suite"
                    ),
                }
                # round-over-round comparability: the paired ratio over
                # the r8 query mix (the r9 headline adds the LM scorer,
                # where Spark BEATS DuckDB at sf10 — a mix shift the
                # suite ratio alone would hide)
                if "r8_mix_paired_ratio" in blk:
                    scale_summary[key]["r8_mix_paired_ratio"] = blk[
                        "r8_mix_paired_ratio"
                    ]
        for key in ("note", "variance_note"):
            if key in scale:
                detail[f"scale_{key}"] = scale[key]
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except Exception as e:
        print(f"# bench detail sidecar write FAILED: {e}", file=sys.stderr)

    # Compact headline — the LAST stdout line, parseable by the driver.
    out = {
        "metric": "headline_suite_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "warm_passes": WARM_PASSES,
        "min_total_sec": round(min_total, 3),
        "cold_total_sec": round(cold_total, 3),
        "duckdb_total_sec": vs_ref.get("duckdb_total_sec"),
        "ratio_comparable": vs_ref.get("ratio"),
        "ratio_raw": vs_ref.get("ratio_raw"),
        # PRIMARY perf stat (r11 verdict task 2): interleaved
        # time-adjacent spark/duckdb pairs — per-query medians of
        # per-pass ratios plus the per-sweep suite ratio; host drift
        # cancels in the division, unlike the separate-sweep medians.
        "paired_ratio_suite": vs_ref.get("paired_ratio_suite"),
        "paired_ratio_per_query": vs_ref.get("paired_ratio_per_query"),
        # headline rows whose driver oracle is invariant-only (their
        # spark medians are rows-only stats, excluded from ratios —
        # e.g. dedup_resolve's probabilistic banding; its comparable
        # sibling dedup_resolve_containment carries the dedup family's
        # paired ratio)
        "rows_only": sorted(set(names) - comparable),
        "scale": scale_summary or None,
        "detail_file": "BENCH_DETAIL.json",
    }
    spark.stop()
    print(json.dumps(out))


def _load_scale_runs():
    """Embed the precomputed large-scale runs (SF1_RESULTS.json, written
    from bench.py runs at sf1/sf10 on gen_sf.py fixtures) if present."""
    try:
        with open(SF1_RESULTS) as f:
            return json.load(f)
    except Exception:
        return None


def _materialize(df) -> None:
    """Pull the full result into the driver as Arrow (columnar), falling
    back to collect() for result types Arrow can't convey."""
    try:
        df.toArrow()
    except Exception:
        df.collect()


def _jvm_gc(spark) -> None:
    """Request a full JVM collection (driver == executor in local
    mode). Measurement hygiene only — see the sweep loop comment."""
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _duckdb_connect():
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads = {CPUS}")
    tables = "region nation customer supplier part orders lineitem events documents embeddings"
    for t in tables.split():
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(path):  # sharded table (tools/gen_sf.py layout)
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _reference_block(
    passes: dict, dpasses: dict, timings: dict, comparable: set
) -> dict:
    """ratio = ours / duckdb over queries whose oracle does the SAME
    work (QuerySpec.comparable). Invariant-oracle queries (e.g.
    dedup_resolve: real LSH vs a 2 ms count) are excluded from the
    headline ratio but still reported under ratio_raw for continuity
    with rounds <=5."""
    dtimes_all = {n: round(statistics.median(r), 3) for n, r in dpasses.items() if r}
    dtotal_raw = sum(dtimes_all.values())
    ours_raw = sum(timings[n] for n in dtimes_all if timings.get(n, -1) > 0)
    dtimes = {n: t for n, t in dtimes_all.items() if n in comparable}
    dpasses = {n: r for n, r in dpasses.items() if n in comparable}
    dtotal = sum(dtimes.values())
    ours = sum(timings[n] for n in dtimes if timings.get(n, -1) > 0)
    # Per-pass paired ratios: spark pass k vs duckdb pass k of the same
    # query ran back-to-back, so ambient contention cancels in the
    # division. Per-query: median of its per-pass ratios. Suite: the
    # per-SWEEP totals are divided (sum of spark pass k over queries /
    # sum of duckdb pass k), then the median over sweeps — weighting by
    # absolute time like the headline ratio (a median over per-query
    # ratios would let 20-ms queries' fixed Spark stage overhead
    # dominate the suite number).
    paired: dict[str, float] = {}
    for n, druns in dpasses.items():
        sruns = passes.get(n, [])
        ratios = [s / max(d, 1e-3) for s, d in zip(sruns, druns)]
        if ratios:
            paired[n] = round(statistics.median(ratios), 2)
    sweep_ratios = []
    for k in range(WARM_PASSES):
        snum = dnum = 0.0
        for n, druns in dpasses.items():
            sruns = passes.get(n, [])
            if len(sruns) > k and len(druns) > k:
                snum += sruns[k]
                dnum += druns[k]
        if dnum > 0:
            sweep_ratios.append(round(snum / dnum, 2))
    slow = {
        n: round(timings[n] / max(dtimes[n], 1e-3), 1)
        for n in dtimes
        if timings.get(n, -1) > 0 and timings[n] > 2 * max(dtimes[n], 1e-3)
    }
    return {
        "engine": f"duckdb[{CPUS} threads]",
        "duckdb_total_sec": round(dtotal, 3),
        "queries": dtimes,
        "passes": dpasses,
        "ours_comparable_sec": round(ours, 3),
        "ratio": round(ours / dtotal, 2) if dtotal > 0 else None,
        "ratio_raw": round(ours_raw / dtotal_raw, 2) if dtotal_raw > 0 else None,
        "excluded_invariant_oracles": sorted(set(dtimes_all) - set(dtimes)),
        "paired_ratio_per_query": paired,
        "paired_ratio_suite": (
            round(statistics.median(sweep_ratios), 2) if sweep_ratios else None
        ),
        "paired_sweep_ratios": sweep_ratios,
        "per_query_over_2x": slow,
    }


if __name__ == "__main__":
    main()
