"""r11 verdict task 5: measure Delta ZORDER data-skipping at sf1.

Writes lineitem (sf1, ~6M rows) to a Delta table in 32 random-layout
files, plans a 2-column box predicate (l_partkey, l_suppkey) through
delta_admitted_files before and after OPTIMIZE ZORDER, and records
files-admitted / files-total each way plus wall times.

Usage: python tools/zorder_skipping_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "probes", "ZORDER_SKIPPING_r12.json",
        )
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from daft_spark.context import configure

    configure(spark)
    from daft_spark.io.delta import (
        delta_admitted_files,
        write_deltalake_py,
        zorder_deltalake_py,
    )
    from daft_spark.io.readers import load_table

    tbl = "/tmp/daft_spark_zorder_probe"
    shutil.rmtree(tbl, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate",
    )
    bounds = li.agg(
        {"l_partkey": "max", "l_suppkey": "max"}
    ).collect()[0]
    pmax, smax = int(bounds["max(l_partkey)"]), int(bounds["max(l_suppkey)"])
    # a ~6% box: quarter of each key range
    box = [
        ("l_partkey", "<", pmax // 4),
        ("l_suppkey", "<", smax // 4),
    ]
    t0 = time.time()
    write_deltalake_py(li.repartition(32), tbl, mode="error")
    t_write = time.time() - t0
    adm0, total0 = delta_admitted_files(tbl, box)
    t0 = time.time()
    res = zorder_deltalake_py(tbl, spark, ["l_partkey", "l_suppkey"],
                              target_files=32)
    t_opt = time.time() - t0
    adm1, total1 = delta_admitted_files(tbl, box)
    out = {
        "probe": "zorder_data_skipping", "sf_dir": sf_dir,
        "rows": li.count(), "predicate": [list(b) for b in box],
        "before": {"admitted": len(adm0), "total": total0,
                   "skip_frac": round(1 - len(adm0) / total0, 4)},
        "after": {"admitted": len(adm1), "total": total1,
                  "skip_frac": round(1 - len(adm1) / total1, 4)},
        "optimize_result": res,
        "write_sec": round(t_write, 2), "optimize_sec": round(t_opt, 2),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(tbl, ignore_errors=True)


if __name__ == "__main__":
    main()
