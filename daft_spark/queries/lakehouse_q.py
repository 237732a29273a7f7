"""Lakehouse roundtrip queries — exercise the pure-Python Delta
transaction log (daft_spark/io/delta.py) end-to-end under the driver's
correctness gate.

The oracle never sees the Delta table: it recomputes the expected
aggregate straight from the source parquet, so a broken log replay
(lost add, unapplied remove, schema drift) shows up as a row/hash
mismatch rather than a self-consistent wrong answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daft_spark.io.readers import load_table
from daft_spark.queries import register


@register(
    "lake_delta_roundtrip",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id < 1000
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def lake_delta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events slice A as a new Delta table (overwrite), APPEND
    slice B as a second commit, then read the table back through the
    log replay and aggregate — two commits' add actions (plus remove
    actions for every file of the previous run's table, since the
    overwrite starts by retiring them) must reassemble exactly the
    source rows. Reference: daft/io/delta_lake/_deltalake.py:22 (read),
    dataframe.py:1767 (write_deltalake)."""
    from daft_spark.io.delta import write_deltalake_py
    from daft_spark.io.lakehouse import read_deltalake

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = os.path.join(
        "/tmp/daft_spark_delta", f"events_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_deltalake_py(e.filter(F.col("event_id") < 600), path, mode="overwrite")
    write_deltalake_py(
        e.filter((F.col("event_id") >= 600) & (F.col("event_id") < 1000)),
        path,
        mode="append",
    )
    t = read_deltalake(path, spark)
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )

@register(
    "lake_iceberg_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey < 1500
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def lake_iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an orders slice as a new Iceberg v2 table (overwrite), then
    APPEND a second slice as a second snapshot (its manifest list must
    re-reference the first snapshot's manifest), then read the table
    back through the pure-Python metadata walk (version-hint ->
    metadata.json -> manifest-list avro -> manifest avro -> parquet) and
    aggregate. The oracle recomputes the expected aggregate straight
    from the source parquet, so a broken avro encoding, lost manifest,
    or schema mis-mapping shows up as a hash mismatch. Reference:
    daft/io/iceberg/_iceberg.py:130 (read), iceberg_write.py (write)."""
    import shutil

    from daft_spark.io.iceberg import write_iceberg_py
    from daft_spark.io.lakehouse import read_iceberg

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_iceberg", f"orders_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 700), path, mode="overwrite")
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 700) & (F.col("o_orderkey") < 1500)),
        path,
        mode="append",
    )
    t = read_iceberg(path, spark)
    return (
        t.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )

@register(
    "lake_paimon_roundtrip",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id >= 200 AND event_id < 1000
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def lake_paimon_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an events slice as a Paimon append-only table, OVERWRITE it
    with a different slice (the new snapshot's delta manifest must carry
    DELETE entries for every first-commit file), append a third slice
    (its base manifest list must carry forward the overwrite's metas),
    then read back through the snapshot -> manifest-list -> manifest walk
    and aggregate. The oracle recomputes from the source parquet, so a
    lost manifest, unapplied DELETE, or broken avro encoding mismatches.
    Reference: daft/io/__init__.py lakehouse reader set."""
    import shutil

    from daft_spark.io.lakehouse import read_paimon
    from daft_spark.io.paimon import write_paimon_py

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = os.path.join(
        "/tmp/daft_spark_paimon", f"events_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_paimon_py(e.filter(F.col("event_id") < 200), path, mode="overwrite")
    write_paimon_py(
        e.filter((F.col("event_id") >= 200) & (F.col("event_id") < 600)),
        path,
        mode="overwrite",
    )
    write_paimon_py(
        e.filter((F.col("event_id") >= 600) & (F.col("event_id") < 1000)),
        path,
        mode="append",
    )
    t = read_paimon(path, spark)
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "lake_hudi_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey >= 300 AND o_orderkey < 1500
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def lake_hudi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an orders slice as a Hudi CoW table, OVERWRITE it with a
    different slice (a replacecommit must retire every first-commit
    file group), append a third slice, then read back through the
    timeline replay and aggregate. The oracle recomputes from the
    source parquet, so a lost file group, unapplied replacecommit, or
    stale-slice resolution mismatches. Reference:
    daft/io/hudi/_hudi.py:18 (read), hudi_scan.py."""
    import shutil

    from daft_spark.io.hudi import write_hudi_py
    from daft_spark.io.lakehouse import read_hudi

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_hudi", f"orders_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_hudi_py(o.filter(F.col("o_orderkey") < 300), path, mode="overwrite")
    write_hudi_py(
        o.filter((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 900)),
        path,
        mode="overwrite",
    )
    write_hudi_py(
        o.filter((F.col("o_orderkey") >= 900) & (F.col("o_orderkey") < 1500)),
        path,
        mode="append",
    )
    t = read_hudi(path, spark)
    return (
        t.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lake_paimon_upsert",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey < 50 THEN CAST(-1.0 AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey >= 25 AND o_orderkey < 300
      UNION ALL
      SELECT o_orderkey + 10000 AS o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 10
    ) ORDER BY o_orderkey
    """,
)
def lake_paimon_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paimon PRIMARY-KEY table: insert a base slice, upsert changed
    totals for keys < 50 plus ten brand-new keys, then DELETE keys
    < 25 — read back through merge-on-read (latest _SEQUENCE_NUMBER
    wins, tombstones drop). The oracle restates the surviving state
    straight from the source table, so a broken sequence order, missed
    tombstone, or key collision mismatches. io/paimon.py
    write_paimon_py(primary_key=...)."""
    import shutil

    from daft_spark.io.lakehouse import read_paimon
    from daft_spark.io.paimon import write_paimon_py

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_paimon", f"orders_pk_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    base = o.filter(F.col("o_orderkey") < 300)
    write_paimon_py(base, path, mode="overwrite", primary_key=["o_orderkey"])
    upd = base.filter(F.col("o_orderkey") < 50).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    new = o.filter(F.col("o_orderkey") < 10).select(
        (F.col("o_orderkey") + 10000).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
    )
    write_paimon_py(upd.unionAll(new), path, primary_key=["o_orderkey"])
    write_paimon_py(
        upd.filter(F.col("o_orderkey") < 25), path,
        primary_key=["o_orderkey"], delete=True,
    )
    return read_paimon(path, spark).orderBy("o_orderkey")


@register(
    "lake_iceberg_deletes",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 400
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 20
    ) ORDER BY o_orderkey
    """,
)
def lake_iceberg_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 ROW-LEVEL DELETES: write a base slice, commit an
    equality-delete for keys < 100, then append keys < 20 back — the
    reader must drop deleted rows from the older files only (the
    strictly-older sequence rule leaves the re-appended rows alive).
    The oracle restates the surviving state from the source table.
    io/iceberg.py delete_iceberg_py + merge-on-read."""
    import shutil

    from daft_spark.io.iceberg import (
        delete_iceberg_py,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_iceberg", f"orders_del_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    base = o.filter(F.col("o_orderkey") < 400)
    write_iceberg_py(base, path, mode="overwrite")
    delete_iceberg_py(base.filter(F.col("o_orderkey") < 100), path,
                      equality_by=["o_orderkey"])
    write_iceberg_py(o.filter(F.col("o_orderkey") < 20), path, mode="append")
    return read_iceberg_py(path, spark).orderBy("o_orderkey")


@register(
    "lake_delta_dml",
    """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'O' THEN CAST(-1.0 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey < 400 AND o_orderstatus <> 'F'
    ORDER BY o_orderkey
    """,
)
def lake_delta_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta copy-on-write DML: write a base slice, DELETE WHERE
    o_orderstatus = 'F', UPDATE o_totalprice = -1 WHERE status 'O' —
    read back through the log replay. The oracle restates the surviving
    mutated state from the source table, so an unapplied remove action,
    wrong predicate semantics, or lost update mismatches. io/delta.py
    delete_deltalake_py / update_deltalake_py."""
    import shutil

    from daft_spark.io.delta import (
        delete_deltalake_py,
        read_deltalake_py,
        update_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_delta", f"orders_dml_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(o.filter(F.col("o_orderkey") < 400), path, mode="overwrite")
    delete_deltalake_py(path, spark, "o_orderstatus = 'F'")
    update_deltalake_py(
        path, spark, {"o_totalprice": "CAST(-1.0 AS DOUBLE)"}, "o_orderstatus = 'O'"
    )
    return read_deltalake_py(path, spark).orderBy("o_orderkey")


@register(
    "lake_hudi_upsert",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey < 60 THEN CAST(-1.0 AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey < 250
      UNION ALL
      SELECT o_orderkey + 20000 AS o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 15
    ) ORDER BY o_orderkey
    """,
)
def lake_hudi_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi record-key UPSERT: insert a base slice, then upsert changed
    totals for keys < 60 plus fifteen new shifted keys in one
    replacecommit — read back through the timeline replay. The oracle
    restates the merged state, so a duplicate surviving key, lost
    insert, or stale file-slice resolution mismatches. io/hudi.py
    write_hudi_py(mode='upsert')."""
    import shutil

    from daft_spark.io.hudi import read_hudi_py, write_hudi_py

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_hudi", f"orders_up_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    base = o.filter(F.col("o_orderkey") < 250)
    write_hudi_py(base, path, mode="overwrite")
    upd = base.filter(F.col("o_orderkey") < 60).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    new = o.filter(F.col("o_orderkey") < 15).select(
        (F.col("o_orderkey") + 20000).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
    )
    write_hudi_py(upd.unionAll(new), path, mode="upsert", record_key="o_orderkey")
    return read_hudi_py(path, spark).orderBy("o_orderkey")


@register(
    "lake_iceberg_pruned",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey < 600
    ORDER BY o_orderkey
    """,
)
def lake_iceberg_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg manifest/partition pruning: write an identity-partitioned
    table, read it back with a pushed-down partition filter — the
    reader evaluates the filter against each manifest entry's partition
    tuple and hands Spark ONLY the matching files (asserted: every
    scanned file sits under the matching hive dir), then applies the
    residual row filter. At 100 TB this is the difference between
    listing one partition and scanning the table. Reference plans scans
    through pyiceberg with pushed partition filters
    (daft/io/iceberg/_iceberg.py:130)."""
    import shutil

    from daft_spark.io.iceberg import read_iceberg_py, write_iceberg_py

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") < 600)
    path = os.path.join(
        "/tmp/daft_spark_iceberg", f"orders_pruned_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o, path, mode="overwrite", partition_by=["o_orderstatus"])
    pruned = read_iceberg_py(path, spark, filters=[("o_orderstatus", "=", "F")])
    scanned = pruned.inputFiles()
    if not scanned or not all("o_orderstatus=F" in f for f in scanned):
        raise AssertionError(f"partition pruning failed; scanned {scanned}")
    return pruned.orderBy("o_orderkey")


@register(
    "lake_iceberg_pos_deletes",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 400 AND o_totalprice >= 50000
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey >= 400 AND o_orderkey < 450
    ) ORDER BY o_orderkey
    """,
)
def lake_iceberg_pos_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 POSITION DELETES, merge-on-read: write a base slice,
    tombstone rows by (file path, row index) with a predicate commit
    (nothing rewritten), append more rows AFTER the delete — the spec's
    same-or-older sequence rule must leave the later append untouched
    even where it matches the predicate... so the appended slice here
    is key-disjoint and the oracle restates the merged state. Row
    identity uses Spark's native _metadata.row_index.
    io/iceberg.py position_delete_iceberg_py + read merge."""
    import shutil

    from daft_spark.io.iceberg import (
        position_delete_iceberg_py,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_iceberg", f"orders_posdel_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 400), path, mode="overwrite")
    position_delete_iceberg_py(path, spark, "o_totalprice < 50000")
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 400) & (F.col("o_orderkey") < 450)),
        path, mode="append",
    )
    return read_iceberg_py(path, spark).orderBy("o_orderkey")


@register(
    "lake_delta_dv",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey < 500 AND NOT (o_totalprice < 100000 AND o_orderstatus = 'F')
    ORDER BY o_orderkey
    """,
)
def lake_delta_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DELETION-VECTOR DELETE (merge-on-read): matching rows are
    tombstoned by parquet row ordinal into a roaring-bitmap DV file
    (io/roaring.py — the spec's RoaringBitmapArray portable format)
    with NO data-file rewrite; the reader anti-joins the positions via
    _metadata.row_index. The oracle restates the surviving rows.
    Reference handles DV tables through delta-rs
    (daft/io/delta_lake/_deltalake.py); the artifact layout is the
    public Delta PROTOCOL.md."""
    import shutil

    from daft_spark.io.delta import (
        delete_deltalake_dv_py,
        read_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") < 500)
    path = os.path.join(
        "/tmp/daft_spark_delta", f"orders_dv_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(o, path, mode="overwrite")
    delete_deltalake_dv_py(
        path, spark, "o_totalprice < 100000 AND o_orderstatus = 'F'"
    )
    return read_deltalake_py(path, spark).orderBy("o_orderkey")


@register(
    "lake_iceberg_stats_pruned",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey < 1500
    ORDER BY o_orderkey
    """,
)
def lake_iceberg_stats_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg FILE-LEVEL column-stats pruning on an UNPARTITIONED
    table: the writer records each data file's lower/upper bounds
    (spec single-value binary, manifest field-ids 125/128) from the
    parquet footer, and the metadata walk skips files whose bounds
    provably exclude the filter — asserted here: a range filter over a
    range-layout table must scan strictly fewer files than exist. At
    100 TB this is what makes a selective scan of an unpartitioned
    table NOT read every file. Reference plans scans through pyiceberg
    which prunes on the same per-file metrics
    (daft/io/iceberg/_iceberg.py:130)."""
    import shutil

    from daft_spark.io.iceberg import (
        _latest_metadata,
        _live_files_and_deletes,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_stats_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    # range layout: files carry disjoint o_orderkey spans, so bounds
    # are selective (the natural state of time-ordered fact tables)
    write_iceberg_py(
        o.repartitionByRange(8, "o_orderkey"), path, mode="overwrite"
    )
    meta = _latest_metadata(path)
    total, _ = _live_files_and_deletes(meta, path, None, None)
    kept, _ = _live_files_and_deletes(
        meta, path, None, [("o_orderkey", "<", 1500)]
    )
    # The file-skip assertion needs files wholly above the cutoff; at
    # tiny SFs (sf0.001 keys span 0..1499) the filter matches every row
    # and keeping all files is the CORRECT answer — assert only when
    # the key range extends well past the cutoff (sf0.01+, incl. the
    # driver's correctness run).
    max_key = o.agg(F.max("o_orderkey")).first()[0]
    if max_key >= 3000 and not (0 < len(kept) < len(total)):
        raise AssertionError(
            f"stats pruning failed: kept {len(kept)} of {len(total)} files "
            f"(max key {max_key})"
        )
    pruned = read_iceberg_py(path, spark, filters=[("o_orderkey", "<", 1500)])
    return pruned.filter(F.col("o_orderkey") < 1500).orderBy("o_orderkey")


@register(
    "lake_delta_dv_update",
    """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_totalprice < 100000 AND o_orderstatus = 'F'
                THEN round(CAST(o_totalprice * 1.1 AS DOUBLE), 2)
                ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def lake_delta_dv_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DELETION-VECTOR UPDATE (merge-on-read): matching rows are
    tombstoned by ordinal into roaring DV files AND their rewritten
    versions appended as new data files in the SAME commit — no base
    file is rewritten, prior versions stay time-travelable. The oracle
    restates the post-update table from the raw parquet. Reference
    reads DV tables through delta-rs (daft/io/delta_lake/
    _deltalake.py); commit layout per the public Delta PROTOCOL.md."""
    import shutil

    from daft_spark.io.delta import (
        read_deltalake_py,
        update_deltalake_dv_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") < 500)
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"orders_dv_upd_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(o, path, mode="overwrite")
    update_deltalake_dv_py(
        path, spark,
        "o_totalprice < 100000 AND o_orderstatus = 'F'",
        {"o_totalprice": "round(o_totalprice * 1.1, 2)"},
    )
    out = read_deltalake_py(path, spark)
    return out.select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    ).orderBy("o_orderkey")


@register(
    "lake_iceberg_schema_evolution",
    """
    WITH t AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS balance,
             CAST(NULL AS VARCHAR) AS tier
      FROM customer WHERE c_custkey < 400
      UNION ALL
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE),
             CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END
      FROM customer WHERE c_custkey >= 400 AND c_custkey < 800
    )
    SELECT coalesce(tier, '(pre-evolution)') AS tier,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(balance AS DECIMAL(18,2))) AS DOUBLE) AS sum_balance
    FROM t GROUP BY 1 ORDER BY 1
    """,
)
def lake_iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg schema evolution end-to-end (spec §Schema Evolution +
    §Column Projection): write a customer slice, RENAME c_acctbal ->
    balance + DROP c_mktsegment + ADD tier (metadata-only commit,
    io/iceberg.py evolve_iceberg_schema), append a second slice under
    the evolved schema, read back. Old files must resolve the renamed
    column BY FIELD ID (a name-based read returns null balances for
    them — the sum mismatches) and read the added column as null; the
    dropped column must not surface. Oracle restates the two slices
    with the same rename/add applied in SQL."""
    import shutil

    from daft_spark.io.iceberg import evolve_iceberg_schema, write_iceberg_py
    from daft_spark.io.lakehouse import read_iceberg

    c = load_table(spark, sf_dir, "customer")
    path = os.path.join(
        "/tmp/daft_spark_iceberg", f"cust_evo_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(
        c.filter(F.col("c_custkey") < 400).select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        ),
        path,
        mode="overwrite",
    )
    evolve_iceberg_schema(
        path,
        renames={"c_acctbal": "balance"},
        add_columns=[("tier", "string")],
        drop_columns=["c_mktsegment"],
    )
    write_iceberg_py(
        c.filter((F.col("c_custkey") >= 400) & (F.col("c_custkey") < 800)).select(
            "c_custkey",
            F.col("c_acctbal").alias("balance"),
            F.when(F.col("c_acctbal") >= 5000, F.lit("gold"))
            .otherwise(F.lit("std"))
            .alias("tier"),
        ),
        path,
        mode="append",
    )
    t = read_iceberg(path, spark)
    assert t.columns == ["c_custkey", "balance", "tier"], t.columns
    return (
        t.groupBy(F.coalesce(F.col("tier"), F.lit("(pre-evolution)")).alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("balance").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_balance"),
        )
        .orderBy("tier")
    )


@register(
    "lake_time_travel",
    """
    WITH v0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey < 600
    ),
    v1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey < 1200
    )
    SELECT 'delta_v0' AS snap, n, key_sum FROM v0
    UNION ALL SELECT 'delta_v1', n, key_sum FROM v1
    UNION ALL SELECT 'iceberg_s0', n, key_sum FROM v0
    UNION ALL SELECT 'iceberg_s1', n, key_sum FROM v1
    ORDER BY snap
    """,
)
def lake_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on BOTH table formats: two commits each, then read
    version 0 vs current for Delta (log replay up to `version`,
    io/delta.py) and snapshot 1 vs current for Iceberg (metadata walk
    pinned to `snapshot_id`, io/iceberg.py). A reader that ignores the
    pin, replays removes wrongly, or walks the wrong manifest list
    shows up as the older snapshot leaking newer rows. Reference:
    read_deltalake(version=...) daft/io/delta_lake/_deltalake.py:22,
    read_iceberg(snapshot_id=...) daft/io/iceberg/_iceberg.py:130."""
    import shutil

    from daft_spark.io.delta import read_deltalake_py, write_deltalake_py
    from daft_spark.io.iceberg import (
        _latest_metadata,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    base = os.path.join(
        "/tmp/daft_spark_tt", os.path.basename(sf_dir.rstrip("/"))
    )
    dpath, ipath = base + "_delta", base + "_ice"
    shutil.rmtree(dpath, ignore_errors=True)
    shutil.rmtree(ipath, ignore_errors=True)
    first = o.filter(F.col("o_orderkey") < 600)
    second = o.filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 1200))
    write_deltalake_py(first, dpath)
    write_deltalake_py(second, dpath, mode="append")
    write_iceberg_py(first, ipath)
    snap0 = _latest_metadata(ipath)["current-snapshot-id"]
    write_iceberg_py(second, ipath, mode="append")

    def agg(df, tag):
        return df.agg(
            F.lit(tag).alias("snap"),
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        ).select("snap", "n", "key_sum")

    return (
        agg(read_deltalake_py(dpath, spark, version=0), "delta_v0")
        .unionAll(agg(read_deltalake_py(dpath, spark), "delta_v1"))
        .unionAll(agg(read_iceberg_py(ipath, spark, snapshot_id=snap0), "iceberg_s0"))
        .unionAll(agg(read_iceberg_py(ipath, spark), "iceberg_s1"))
        .orderBy("snap")
    )


@register(
    "lake_iceberg_partition_evolution",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 1200
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_iceberg_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg PARTITION EVOLUTION (spec §Partition Evolution): the
    table starts unpartitioned, evolve_iceberg_partition_spec flips the
    default spec to identity(o_orderstatus) metadata-only, and the next
    append ADOPTS it — so one table holds manifests under two specs.
    The scan planner resolves each manifest's partition tuples with ITS
    OWN spec-id (io/iceberg.py _live_files_and_deletes): asserted here
    by filtering on the evolved column — old-spec files can't be tuple-
    pruned (all kept), new-spec files scan only the matching hive dir.
    The oracle restates the union from raw parquet; a reader that
    applies the wrong spec to old manifests loses or duplicates rows.
    Reference: pyiceberg-evolved tables plan through the same metadata
    (daft/io/iceberg/_iceberg.py:130)."""
    import shutil

    from daft_spark.io.iceberg import (
        evolve_iceberg_partition_spec,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_pevo_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 600), path)
    evolve_iceberg_partition_spec(path, ["o_orderstatus"])
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 1200)),
        path, mode="append",
    )
    # per-manifest spec resolution: new-spec files prune to one hive
    # dir, old-spec files (no partition tuple) all survive the filter
    probe = read_iceberg_py(path, spark, filters=[("o_orderstatus", "=", "O")])
    part_files = [f for f in probe.inputFiles() if "/data/o_orderstatus=" in f]
    if not part_files or not all("o_orderstatus=O" in f for f in part_files):
        raise AssertionError(f"evolved-spec pruning failed; scanned {part_files}")
    return (
        read_iceberg_py(path, spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lake_delta_column_mapping",
    """
    SELECT c_nationkey AS nation,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS balance
    FROM customer WHERE c_custkey < 1000
    GROUP BY c_nationkey ORDER BY nation
    """,
)
def lake_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta COLUMN MAPPING end-to-end (PROTOCOL.md §Column Mapping):
    enable mapping on an existing table (protocol minReader 2 /
    minWriter 5; physicalName = pre-upgrade name so old files stay
    readable), rename two columns metadata-only (evolve_delta_schema),
    then append — the new files carry PHYSICAL column names while both
    eras read back under the renamed logical schema. A reader that
    resolves by logical name after the rename loses the appended
    files' values (they're stored under the old physical name), which
    the oracle's restatement from raw parquet would expose. Reference
    reads mapped tables through delta-rs
    (daft/io/delta_lake/_deltalake.py:22)."""
    import shutil

    from daft_spark.io.delta import (
        evolve_delta_schema,
        read_deltalake_py,
        set_column_mapping_delta_py,
        write_deltalake_py,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"cust_colmap_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(c.filter(F.col("c_custkey") < 500), path)
    set_column_mapping_delta_py(path)
    evolve_delta_schema(
        path, renames={"c_nationkey": "nation", "c_acctbal": "balance"}
    )
    write_deltalake_py(
        c.filter((F.col("c_custkey") >= 500) & (F.col("c_custkey") < 1000))
        .withColumnRenamed("c_nationkey", "nation")
        .withColumnRenamed("c_acctbal", "balance"),
        path,
        mode="append",
    )
    return (
        read_deltalake_py(path, spark)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("balance").cast("double"), 2).alias("balance"),
        )
        .orderBy("nation")
        .select("nation", "n", "balance")
    )


@register(
    "lake_delta_optimize",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 1800
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_delta_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta OPTIMIZE compaction (optimize_deltalake_py): three small
    append commits are bin-packed into fewer files in one
    dataChange=false commit (the PROTOCOL.md semantics that keep
    streaming sources from re-delivering rearranged rows, asserted in
    test_delta.py). Asserted here: the live file set SHRINKS while the
    table content is byte-identical to the oracle's restatement — a
    compactor that drops or duplicates rows across bin boundaries
    fails the hash. At 100 TB compaction is what keeps a
    frequently-appended table's file count (and thus scan planning
    cost) bounded. The reference exposes compaction via delta-rs
    out-of-band; this is the in-engine equivalent."""
    import shutil

    from daft_spark.io.delta import (
        optimize_deltalake_py,
        read_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"orders_opt_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    for lo in (0, 600, 1200):
        write_deltalake_py(
            o.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + 600)),
            path, mode="append" if lo else "error",
        )
    before = len(read_deltalake_py(path, spark).inputFiles())
    stats = optimize_deltalake_py(path, spark)
    back = read_deltalake_py(path, spark)
    if stats["removed"] < 2 or len(back.inputFiles()) >= before:
        raise AssertionError(
            f"OPTIMIZE did not shrink the live file set: {stats}, "
            f"{before} -> {len(back.inputFiles())}"
        )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lake_maintenance",
    """
    WITH cur AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 900
    )
    SELECT 'delta_vacuumed' AS tbl, n, key_sum FROM cur
    UNION ALL SELECT 'iceberg_expired', n, key_sum FROM cur
    ORDER BY tbl
    """,
)
def lake_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage maintenance on BOTH formats — what keeps a
    frequently-committed 100 TB table's metadata and dead storage
    bounded. Delta: overwrite retires the first commit's files, VACUUM
    (retention 0) physically deletes them (asserted: retired parquet
    gone from disk, live read intact). Iceberg: the same overwrite
    pattern, then expire_iceberg_snapshots(keep_last=1) prunes the old
    snapshot from metadata AND deletes its now-unreferenced data files
    + manifests (asserted: time travel to the expired id raises). The
    oracle restates the surviving state; a maintenance pass that
    deletes a LIVE file surfaces as missing rows, one that keeps dead
    metadata surfaces in the assertions."""
    import shutil

    from daft_spark.io.delta import (
        read_deltalake_py,
        vacuum_deltalake_py,
        write_deltalake_py,
    )
    from daft_spark.io.iceberg import (
        _latest_metadata,
        expire_iceberg_snapshots,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    base = os.path.join(
        "/tmp/daft_spark_maint", os.path.basename(sf_dir.rstrip("/"))
    )
    dpath, ipath = base + "_delta", base + "_ice"
    shutil.rmtree(dpath, ignore_errors=True)
    shutil.rmtree(ipath, ignore_errors=True)
    stale = o.filter(F.col("o_orderkey") < 300)
    cur = o.filter((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 900))

    write_deltalake_py(stale, dpath)
    write_deltalake_py(cur, dpath, mode="overwrite")
    gone = vacuum_deltalake_py(dpath, retention_ms=0)
    disk = [
        f for root, _d, fs in os.walk(dpath) if "_delta_log" not in root
        for f in fs if f.endswith(".parquet")
    ]
    dlive = read_deltalake_py(dpath, spark)
    if not gone or len(disk) != len(dlive.inputFiles()):
        raise AssertionError(f"VACUUM left dead files: deleted={len(gone)}, disk={len(disk)}")

    write_iceberg_py(stale, ipath)
    snap0 = _latest_metadata(ipath)["current-snapshot-id"]
    write_iceberg_py(cur, ipath, mode="overwrite")
    stats = expire_iceberg_snapshots(ipath, keep_last=1)
    if stats["expired_snapshots"] != 1 or stats["deleted_files"] < 1:
        raise AssertionError(f"expire did nothing: {stats}")
    try:
        read_iceberg_py(ipath, spark, snapshot_id=snap0)
        raise AssertionError("expired snapshot still time-travelable")
    except ValueError:
        pass
    ilive = read_iceberg_py(ipath, spark)

    def agg(df, tag):
        return df.agg(
            F.lit(tag).alias("tbl"),
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        ).select("tbl", "n", "key_sum")

    return agg(dlive, "delta_vacuumed").unionAll(agg(ilive, "iceberg_expired")).orderBy("tbl")


@register(
    "lake_iceberg_compaction",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey < 1800 AND o_totalprice >= 50000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_iceberg_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg COMPACTION (rewrite_iceberg_data_files — the spec's
    ``replace`` snapshot, Iceberg's RewriteDataFiles): three small
    append commits plus a PENDING equality delete are compacted into
    fewer files; the rewrite MATERIALIZES the delete through the same
    merge-on-read scan a table read uses, and survivor manifests carry
    explicit per-entry sequence numbers so untouched files keep their
    delete-application semantics. Asserted: the live file set shrinks
    and the compacted read equals the oracle's restatement — a rewrite
    that double-applies or loses the delete, or mis-stamps sequence
    numbers, fails the hash. At 100 TB compaction bounds manifest and
    small-file growth the same way Delta's OPTIMIZE does
    (lake_delta_optimize)."""
    import shutil

    from daft_spark.io.iceberg import (
        delete_iceberg_py,
        read_iceberg_py,
        rewrite_iceberg_data_files,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_compact_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    for lo in (0, 600, 1200):
        write_iceberg_py(
            o.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + 600)),
            path, mode="append" if lo else "error",
        )
    delete_iceberg_py(
        o.filter((F.col("o_orderkey") < 1800) & (F.col("o_totalprice") < 50000))
        .select("o_orderkey"),
        path, equality_by=["o_orderkey"],
    )
    before = len(read_iceberg_py(path, spark).inputFiles())
    stats = rewrite_iceberg_data_files(path, spark)
    back = read_iceberg_py(path, spark)
    if stats["removed"] < 2 or len(back.inputFiles()) >= before:
        raise AssertionError(
            f"compaction did not shrink the live file set: {stats}, "
            f"{before} -> {len(back.inputFiles())}"
        )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lake_iceberg_refs",
    """
    WITH v0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey < 500
    ),
    head AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500
    )
    SELECT 'branch_audit' AS ref, n, key_sum FROM v0
    UNION ALL SELECT 'main', n, key_sum FROM head
    UNION ALL SELECT 'tag_v1', n, key_sum FROM v0
    ORDER BY ref
    """,
)
def lake_iceberg_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg NAMED REFS (spec §Snapshot References; the reference
    exposes branch/tag read options on Iceberg tables —
    daft/catalog/__glue.py GlueIcebergTable._read_options): tag `v1`
    and branch `audit` pin the first snapshot, an overwrite moves main
    past it, and all three refs read side by side. Refs also PROTECT
    their snapshots from expire_iceberg_snapshots (asserted: keep_last=1
    expires nothing while the refs stand). A reader that resolves refs
    against the wrong snapshot, or loses refs across commits (they must
    persist through the overwrite's metadata rebuild), shows as a hash
    mismatch."""
    import shutil

    from daft_spark.io.iceberg import (
        expire_iceberg_snapshots,
        read_iceberg_py,
        set_iceberg_ref,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_refs_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 500), path)
    set_iceberg_ref(path, "v1", ref_type="tag")
    set_iceberg_ref(path, "audit", ref_type="branch")
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1500)),
        path, mode="overwrite",
    )
    if expire_iceberg_snapshots(path, keep_last=1)["expired_snapshots"] != 0:
        raise AssertionError("refs failed to protect their snapshots")

    def agg(df, tag):
        return df.agg(
            F.lit(tag).alias("ref"),
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        ).select("ref", "n", "key_sum")

    return (
        agg(read_iceberg_py(path, spark, ref="audit"), "branch_audit")
        .unionAll(agg(read_iceberg_py(path, spark, ref="main"), "main"))
        .unionAll(agg(read_iceberg_py(path, spark, ref="v1"), "tag_v1"))
        .orderBy("ref")
    )


@register(
    "lake_time_travel_hudi_paimon",
    """
    WITH v0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey < 400
    ),
    head AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT 'hudi_asof' AS snap, n, key_sum FROM v0
    UNION ALL SELECT 'hudi_head', n, key_sum FROM head
    UNION ALL SELECT 'paimon_s1', n, key_sum FROM v0
    UNION ALL SELECT 'paimon_head', n, key_sum FROM head
    ORDER BY snap
    """,
)
def lake_time_travel_hudi_paimon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on the OTHER two formats (completing the
    lake_time_travel pair): Hudi pins the timeline replay to an instant
    (read_hudi_py(as_of=...) — the as.of.instant semantics of Hudi's
    reader; instants surfaced by hudi_timeline), Paimon pins the
    snapshot id (read_paimon_py(snapshot=...) — snapshot/snapshot-<id>
    pointer walk). A replay that leaks later file slices into the
    pinned view, or resolves the wrong base manifest list, shows as a
    hash mismatch against the per-slice oracles."""
    import shutil

    from daft_spark.io.hudi import hudi_timeline, read_hudi_py, write_hudi_py
    from daft_spark.io.paimon import read_paimon_py, write_paimon_py

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    base = os.path.join(
        "/tmp/daft_spark_tt2", os.path.basename(sf_dir.rstrip("/"))
    )
    hpath, ppath = base + "_hudi", base + "_paimon"
    shutil.rmtree(hpath, ignore_errors=True)
    shutil.rmtree(ppath, ignore_errors=True)
    first = o.filter(F.col("o_orderkey") < 400)
    second = o.filter((F.col("o_orderkey") >= 400) & (F.col("o_orderkey") < 1000))
    write_hudi_py(first, hpath)
    t0 = hudi_timeline(hpath)[-1][0]
    write_hudi_py(second, hpath, mode="append")
    write_paimon_py(first, ppath)
    write_paimon_py(second, ppath, mode="append")

    def agg(df, tag):
        return df.agg(
            F.lit(tag).alias("snap"),
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        ).select("snap", "n", "key_sum")

    return (
        agg(read_hudi_py(hpath, spark, as_of=t0), "hudi_asof")
        .unionAll(agg(read_hudi_py(hpath, spark), "hudi_head"))
        .unionAll(agg(read_paimon_py(ppath, spark, snapshot=1), "paimon_s1"))
        .unionAll(agg(read_paimon_py(ppath, spark), "paimon_head"))
        .orderBy("snap")
    )


@register(
    "lake_iceberg_metadata_tables",
    """
    SELECT 'files_rows' AS kind,
           CAST(count(*) AS BIGINT) AS metric
    FROM orders WHERE o_orderkey < 600
    UNION ALL SELECT 'history', 2
    UNION ALL SELECT 'manifests', 2
    UNION ALL SELECT 'refs', 1
    UNION ALL SELECT 'snapshot_ops', 2
    ORDER BY kind
    """,
)
def lake_iceberg_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg metadata INSPECTION tables (iceberg_metadata_table —
    the table.snapshots/files/manifests/history/refs surface pyiceberg
    and Spark SQL expose; the reference plans through pyiceberg whose
    inspect API serves the same views): a two-commit table with one tag
    is inspected through all five views, reduced to deterministic
    metrics (snapshot count, history length, manifest count, ref count,
    live-file row-count total). The files view's record_count SUM must
    equal the actual rows written — the one metric the raw-parquet
    oracle restates independently; an inspection layer that drops a
    manifest or double-counts entries mismatches."""
    import shutil

    from daft_spark.io.iceberg import (
        iceberg_metadata_table,
        set_iceberg_ref,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_meta_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 300), path)
    set_iceberg_ref(path, "v1", ref_type="tag")
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600)),
        path, mode="append",
    )

    def one(kind, df):
        return df.agg(F.lit(kind).alias("kind"), F.expr("CAST(count(*) AS BIGINT)").alias("metric")).select("kind", "metric")

    files = iceberg_metadata_table(path, spark, "files")
    files_rows = files.agg(
        F.lit("files_rows").alias("kind"),
        F.sum("record_count").alias("metric"),
    ).select("kind", "metric")
    return (
        files_rows
        .unionAll(one("history", iceberg_metadata_table(path, spark, "history")))
        .unionAll(one("manifests", iceberg_metadata_table(path, spark, "manifests")))
        .unionAll(one("refs", iceberg_metadata_table(path, spark, "refs")))
        .unionAll(one("snapshot_ops", iceberg_metadata_table(path, spark, "snapshots")))
        .orderBy("kind")
    )


@register(
    "lake_delta_cdf",
    """
    WITH live AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1200
    )
    SELECT 'delete' AS change_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM live WHERE o_totalprice < 50000
    UNION ALL
    SELECT 'insert', CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey >= 800 AND o_orderkey < 1200
    UNION ALL
    SELECT 'update_postimage', CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey) AS BIGINT)
    FROM live WHERE o_totalprice >= 200000
    UNION ALL
    SELECT 'update_preimage', CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey) AS BIGINT)
    FROM live WHERE o_totalprice >= 200000
    ORDER BY change_type
    """,
)
def lake_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHANGE DATA FEED (PROTOCOL.md §Change Data Files; the
    readChangeFeed/table_changes surface): enable_cdf_delta_py flips
    delta.enableChangeDataFeed (writer v4), after which DELETE and
    UPDATE commits write explicit cdc files under _change_data/
    (dataChange=false) while plain appends reconstruct as inserts from
    their add actions — and table_changes_delta_py serves the
    per-version row-level feed. The oracle restates each change class
    independently from raw parquet (the delete predicate's matches, the
    appended slice, the update predicate's pre/post sets); a feed that
    double-counts the rewrite's add/remove storm instead of honoring
    the cdc actions inflates every class."""
    import shutil

    from daft_spark.io.delta import (
        delete_deltalake_py,
        enable_cdf_delta_py,
        table_changes_delta_py,
        update_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"orders_cdf_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(o.filter(F.col("o_orderkey") < 800), path)  # v0
    enable_cdf_delta_py(path)  # v1
    write_deltalake_py(  # v2: inserts
        o.filter((F.col("o_orderkey") >= 800) & (F.col("o_orderkey") < 1200)),
        path, mode="append",
    )
    delete_deltalake_py(path, spark, "o_totalprice < 50000")  # v3: cdc
    update_deltalake_py(  # v4: cdc pre+post
        path, spark, {"o_totalprice": "o_totalprice + 1"},
        "o_totalprice >= 200000",
    )
    return (
        table_changes_delta_py(path, spark, starting_version=2)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("change_type")
    )


@register(
    "lake_iceberg_upsert",
    """
    WITH updated AS (
      SELECT o_orderkey,
             CAST(o_totalprice * 2 AS DOUBLE) AS price
      FROM orders WHERE o_orderkey < 200
    ),
    kept AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey >= 200 AND o_orderkey < 900
    ),
    inserted AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey >= 900 AND o_orderkey < 1100
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(price) AS DOUBLE), 2) AS price_sum,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM (SELECT * FROM updated UNION ALL SELECT * FROM kept
          UNION ALL SELECT * FROM inserted)
    """,
)
def lake_iceberg_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg single-commit MoR UPSERT (upsert_iceberg_py — the
    Flink CDC sink's commit shape: one snapshot carrying BOTH an
    equality-delete manifest and the new data manifest at the same
    sequence number; the spec's strictly-older rule deletes prior key
    matches while the same-commit inserts survive). The upsert batch
    doubles the price of existing keys <200 and inserts fresh keys
    900-1100; the oracle restates updated+kept+inserted independently.
    A two-commit upsert that exposed the deleted-gap state, or a
    same-sequence delete that killed its own inserts, mismatches.
    Exactly-one-snapshot is asserted."""
    import shutil

    from daft_spark.io.iceberg import (
        _latest_metadata,
        read_iceberg_py,
        upsert_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_upsert_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 900), path)
    batch = (
        o.filter(F.col("o_orderkey") < 200)
        .withColumn("price", F.col("price") * 2)
        .unionAll(
            o.filter((F.col("o_orderkey") >= 900) & (F.col("o_orderkey") < 1100))
        )
    )
    before = len(_latest_metadata(path)["snapshots"])
    upsert_iceberg_py(batch, path, equality_by=["o_orderkey"])
    if len(_latest_metadata(path)["snapshots"]) != before + 1:
        raise AssertionError("upsert was not a single snapshot")
    return read_iceberg_py(path, spark).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("price"), 2).alias("price_sum"),
        F.sum("o_orderkey").alias("key_sum"),
    ).select("n", "price_sum", "key_sum")


@register(
    "lake_delta_merge",
    """
    WITH target AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey < 800
    ),
    source AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_orderkey >= 400 AND o_orderkey < 1200
    ),
    merged AS (
      -- matched & price<100000 deleted; matched else updated (price*3);
      -- unmatched target kept; unmatched source inserted
      SELECT t.o_orderkey, t.o_orderstatus,
             CASE WHEN s.o_orderkey IS NOT NULL THEN t.price * 3
                  ELSE t.price END AS price
      FROM target t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
      WHERE NOT (s.o_orderkey IS NOT NULL AND s.price < 100000)
      UNION ALL
      SELECT s.o_orderkey, s.o_orderstatus, s.price
      FROM source s LEFT JOIN target t ON t.o_orderkey = s.o_orderkey
      WHERE t.o_orderkey IS NULL
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(price) AS DOUBLE), 2) AS price_sum
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta MERGE INTO (merge_deltalake_py — update + delete + insert
    clauses in ONE copy-on-write commit, with Delta's
    multiple-source-match guard): target = keys <800, source = keys
    400-1200; matched rows with source price <100000 are DELETED,
    other matches get price tripled, unmatched source rows INSERT. The
    oracle restates the merge relationally (left join + anti join); a
    merge that applies clauses in the wrong precedence, loses unmatched
    targets, or double-inserts mismatches."""
    import shutil

    from daft_spark.io.delta import (
        merge_deltalake_py,
        read_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"orders_merge_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(o.filter(F.col("o_orderkey") < 800), path)
    source = o.filter((F.col("o_orderkey") >= 400) & (F.col("o_orderkey") < 1200))
    merge_deltalake_py(
        path, spark, source, "t.o_orderkey = s.o_orderkey",
        when_matched_update={"price": "t.price * 3"},
        when_matched_delete="s.price < 100000",
    )
    return (
        read_deltalake_py(path, spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price"), 2).alias("price_sum"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lake_delta_cdf_partitioned",
    """
    WITH tagged AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE CAST(o_orderkey % 4 AS VARCHAR) END AS bucket
      FROM orders
    ),
    live AS (SELECT * FROM tagged WHERE o_orderkey < 1200)
    SELECT 'delete' AS change_type, bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM live WHERE o_totalprice < 50000 GROUP BY bucket
    UNION ALL
    SELECT 'insert', bucket, CAST(count(*) AS BIGINT), CAST(sum(o_orderkey) AS BIGINT)
    FROM tagged WHERE o_orderkey >= 800 AND o_orderkey < 1200 GROUP BY bucket
    UNION ALL
    SELECT 'update_postimage', bucket, CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey) AS BIGINT)
    FROM live WHERE o_totalprice >= 200000 GROUP BY bucket
    UNION ALL
    SELECT 'update_preimage', bucket, CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey) AS BIGINT)
    FROM live WHERE o_totalprice >= 200000 GROUP BY bucket
    ORDER BY change_type, bucket NULLS FIRST
    """,
)
def lake_delta_cdf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED on a PARTITIONED Delta table (late-r7: cdc
    files under hive dirs with partitionValues, incl. a NULL partition
    value): DELETE/UPDATE emit partitioned cdc, appends reconstruct as
    inserts with partition values restored from their add actions. The
    oracle restates every change class per partition bucket, so a
    wrong or lost partition value hash-mismatches."""
    import shutil

    from daft_spark.io.delta import (
        delete_deltalake_py,
        enable_cdf_delta_py,
        table_changes_delta_py,
        update_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise((F.col("o_orderkey") % 4).cast("string"))
        .alias("bucket"),
    )
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"orders_cdf_part_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(
        o.filter(F.col("o_orderkey") < 800), path, partition_by=["bucket"]
    )  # v0
    enable_cdf_delta_py(path)  # v1
    write_deltalake_py(  # v2: inserts (reconstructed from adds)
        o.filter((F.col("o_orderkey") >= 800) & (F.col("o_orderkey") < 1200)),
        path, mode="append", partition_by=["bucket"],
    )
    delete_deltalake_py(path, spark, "o_totalprice < 50000")  # v3: cdc
    update_deltalake_py(  # v4: cdc pre+post
        path, spark, {"o_totalprice": "o_totalprice + 1"},
        "o_totalprice >= 200000",
    )
    return (
        table_changes_delta_py(path, spark, starting_version=2)
        .groupBy(F.col("_change_type").alias("change_type"), "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("change_type", F.col("bucket").asc_nulls_first())
    )


@register(
    "lake_iceberg_sorted",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders WHERE o_orderkey < 1200 ORDER BY o_orderkey
    """,
)
def lake_iceberg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg SORT ORDERS (spec §Sorting; late r7): sort_by records
    the order in table metadata (order-id 1, identity/asc/nulls-first)
    and physically sorts rows within each written file, so the
    range-layout files carry tight o_orderkey bounds — asserted: the
    metadata carries the sort order AND a range filter still prunes
    files. The query returns the filtered slice against a plain SQL
    oracle, so the sorted write path is value-verified end to end."""
    import shutil

    from daft_spark.io.iceberg import (
        _latest_metadata,
        _live_files_and_deletes,
        read_iceberg_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_sorted_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(
        o.repartitionByRange(8, "o_orderkey"),
        path, mode="overwrite", sort_by=["o_orderkey"],
    )
    meta = _latest_metadata(path)
    order = next(
        s for s in meta["sort-orders"]
        if s["order-id"] == meta["default-sort-order-id"]
    )
    if not order["fields"] or order["fields"][0]["direction"] != "asc":
        raise AssertionError(f"sort order not recorded: {meta['sort-orders']}")
    total, _ = _live_files_and_deletes(meta, path, None, None)
    kept, _ = _live_files_and_deletes(
        meta, path, None, [("o_orderkey", "<", 1200)]
    )
    max_key = o.agg(F.max("o_orderkey")).first()[0]
    if max_key >= 3000 and not (0 < len(kept) < len(total)):
        raise AssertionError(
            f"sorted-layout pruning failed: kept {len(kept)}/{len(total)}"
        )
    return (
        read_iceberg_py(path, spark, filters=[("o_orderkey", "<", 1200)])
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
        .orderBy("o_orderkey")
    )


@register(
    "lake_delta_restore",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
)
def lake_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE: base write (v0), append (v1), destructive DELETE
    (v2), then RESTORE to v1 — one metadata commit re-referencing v1's
    files, no data movement (io/delta.py restore_deltalake_py). The
    oracle restates v1's exact state from the source table, so a wrong
    remove/add flip, lost append, or schema drift mismatches; the query
    also asserts the restore added a version (history preserved) rather
    than rewriting one."""
    import shutil

    from daft_spark.io.delta import (
        _list_versions,
        delete_deltalake_py,
        read_deltalake_py,
        restore_deltalake_py,
        write_deltalake_py,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(
        "/tmp/daft_spark_delta", f"orders_restore_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_deltalake_py(o.filter(F.col("o_orderkey") < 200), path, mode="overwrite")
    write_deltalake_py(
        o.filter((F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 300)),
        path, mode="append",
    )
    delete_deltalake_py(path, spark, "o_orderkey >= 100")
    restore_deltalake_py(path, version=1)
    assert max(_list_versions(path)) == 3, "restore must append a version"
    return read_deltalake_py(path, spark).orderBy("o_orderkey")


@register(
    "lake_iceberg_branch_write",
    """
    SELECT 'main' AS ref,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderkey < 500 OR (o_orderkey >= 1000 AND o_orderkey < 1100)
    UNION ALL
    SELECT 'wap',
           CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderkey < 1000
    ORDER BY ref
    """,
)
def lake_iceberg_branch_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg BRANCH WRITES (write-audit-publish): an append lands on
    branch `wap` without moving main, a later append moves main without
    touching the branch, and both heads read side by side — branch
    isolation in BOTH directions, value-checked. io/iceberg.py
    write_iceberg_branch_py (snapshot rebased onto the branch head's
    manifest list; only refs[wap] moves)."""
    import shutil

    from daft_spark.io.iceberg import (
        read_iceberg_py,
        set_iceberg_ref,
        write_iceberg_branch_py,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_branch_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 500), path)
    set_iceberg_ref(path, "wap", ref_type="branch")
    write_iceberg_branch_py(
        o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1000)),
        path, "wap",
    )
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 1100)),
        path, mode="append",
    )

    def _agg(df, label):
        return df.agg(
            F.lit(label).alias("ref"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        ).select("ref", "n", "key_sum")

    main = _agg(read_iceberg_py(path, spark), "main")
    wap = _agg(read_iceberg_py(path, spark, ref="wap"), "wap")
    return main.unionAll(wap).orderBy("ref")


@register(
    "lake_iceberg_incremental",
    """
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderkey >= 300 AND o_orderkey < 900
    ORDER BY o_orderkey
    """,
)
def lake_iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg INCREMENTAL APPEND scan (the connector's
    start-snapshot-id/end-snapshot-id options, io/iceberg.py
    read_iceberg_incremental): three appends land as snapshots s0..s2,
    a compaction rewrites everything as a replace snapshot, and the
    incremental read AFTER s0 must return exactly the rows appends #2
    and #3 added — the compaction invisible, the base snapshot
    excluded. The oracle restates that exact slice, so re-delivered
    compacted rows or a leaked base row hash-mismatches."""
    import shutil

    from daft_spark.io.iceberg import (
        _latest_metadata,
        read_iceberg_incremental,
        rewrite_iceberg_data_files,
        write_iceberg_py,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    path = os.path.join(
        "/tmp/daft_spark_iceberg",
        f"orders_incr_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_py(o.filter(F.col("o_orderkey") < 300), path)
    s0 = _latest_metadata(path)["current-snapshot-id"]
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 300) & (F.col("o_orderkey") < 600)),
        path, mode="append",
    )
    write_iceberg_py(
        o.filter((F.col("o_orderkey") >= 600) & (F.col("o_orderkey") < 900)),
        path, mode="append",
    )
    rewrite_iceberg_data_files(path, spark)  # replace snapshot: invisible
    return read_iceberg_incremental(path, spark, start_snapshot_id=s0).orderBy(
        "o_orderkey"
    )


@register(
    "lake_delta_zorder",
    """
    SELECT CAST(l_orderkey % 7 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(l_partkey) AS BIGINT) AS part_sum
    FROM lineitem WHERE l_orderkey < 2400
    GROUP BY bucket ORDER BY bucket
    """,
)
def lake_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta OPTIMIZE ZORDER + per-file stats data skipping
    (zorder_deltalake_py / delta_admitted_files): the table is written
    as orderkey-ranged appends — so partkey predicates admit EVERY
    file — then rewritten clustered on the Morton curve over
    (l_orderkey, l_partkey). Asserted in-query: before zorder a
    partkey range admits all files; after, the SAME predicate prunes
    (admitted < total) AND an orderkey range still prunes — the
    multi-column skipping a linear sort cannot give. Content is then
    hash-checked against the oracle's restatement, so a rewrite that
    drops/duplicates rows fails. Stats themselves are footer-lifted
    at write time (delta-spark writes stats by default; this engine
    now does too)."""
    import shutil

    from daft_spark.io.delta import (
        delta_admitted_files,
        read_deltalake_py,
        write_deltalake_py,
        zorder_deltalake_py,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).filter(F.col("l_orderkey") < 2400)
    path = os.path.join(
        "/tmp/daft_spark_delta",
        f"lineitem_zorder_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    for lo in (0, 800, 1600):
        write_deltalake_py(
            li.filter(
                (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < lo + 800)
            ).coalesce(1),
            path, mode="append" if lo else "error",
        )
    part_pred = [("l_partkey", "<", 30)]
    adm_before, total_before = delta_admitted_files(path, part_pred)
    if len(adm_before) < total_before:
        raise AssertionError(
            "fixture broken: partkey predicate pruned before zorder"
        )
    res = zorder_deltalake_py(
        spark=spark, path=path, zorder_by=["l_orderkey", "l_partkey"],
        target_files=4,
    )
    if res["removed"] < 3 or res["added"] < 2:
        raise AssertionError(f"zorder rewrite unexpected: {res}")
    adm_part, total = delta_admitted_files(path, part_pred)
    adm_key, _ = delta_admitted_files(path, [("l_orderkey", "<", 300)])
    if not (len(adm_part) < total and len(adm_key) < total):
        raise AssertionError(
            f"zorder stats did not prune: partkey {len(adm_part)}/{total}, "
            f"orderkey {len(adm_key)}/{total}"
        )
    back = read_deltalake_py(path, spark)
    return (
        back.groupBy((F.col("l_orderkey") % 7).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("key_sum"),
            F.sum("l_partkey").alias("part_sum"),
        )
        .orderBy("bucket")
    )
