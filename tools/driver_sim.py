"""Driver-grade pre-validation: run EVERY registered query at a given
scale dir against its DuckDB oracle with the driver's own strictness —
name-sorted columns, sorted rows, EXACT value compare after round-6
float quantization (the driver hashes values; rtol does not save you).

Usage:  python tools/driver_sim.py [sf_dir] [name_substring ...]
Writes a summary line per query and a final PASS/FAIL count; exits 1 on
any mismatch. Record the result in COVERAGE.md at round close.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_norm(x)) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def main() -> None:
    import duckdb

    from daft_spark.context import get_or_create, release_caches
    from daft_spark.queries import all_queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pats = sys.argv[2:]
    spark = get_or_create(app_name="driver_sim", master="local[16]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = all_queries()
    names = [n for n in qs if not pats or any(p in n for p in pats)]
    bad: list[str] = []
    rows_only = 0
    for name in names:
        spec = qs[name]
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            srows = [
                tuple(_norm(v) for _c, v in sorted(r.asDict().items()))
                for r in sdf.collect()
            ]
            if spec.oracle is None:
                status = "rows_only" if srows else "rows_only_EMPTY"
                rows_only += 1
                print(f"{name}: {status} ({len(srows)} rows)", flush=True)
                continue
            cur = con.execute(spec.oracle)
            cols = [d[0] for d in cur.description]
            orows = [
                tuple(_norm(v) for _c, v in sorted(zip(cols, r)))
                for r in cur.fetchall()
            ]
            scols = sorted(c.lower() for c in sdf.columns)
            ocols = sorted(c.lower() for c in cols)
            if scols != ocols:
                bad.append(name)
                print(f"{name}: SCHEMA {scols} vs {ocols}", flush=True)
                continue
            nullsafe = lambda row: tuple((v is None, v or "") for v in row)  # noqa: E731
            srows.sort(key=nullsafe)
            orows.sort(key=nullsafe)
            if len(srows) != len(orows):
                bad.append(name)
                print(
                    f"{name}: ROWS spark={len(srows)} oracle={len(orows)}",
                    flush=True,
                )
                continue
            diff = sum(1 for a, b in zip(srows, orows) if a != b)
            if diff or not srows:
                bad.append(name)
                print(
                    f"{name}: {'EMPTY' if not srows else f'{diff} mismatched rows'}"
                    f" of {len(srows)}",
                    flush=True,
                )
                continue
            print(f"{name}: exact ({len(srows)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        finally:
            release_caches(spark)
    n = len(names)
    print(
        f"\n{n - len(bad)}/{n} exact-or-rows-only ({rows_only} rows-only); "
        f"failures: {bad or 'none'}"
    )
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
