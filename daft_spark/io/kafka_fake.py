"""File-backed Kafka topic log — an in-process stand-in for a broker
so the bounded-read path (offset bounding, partition fan-out, the
Kafka source's output schema) is testable without one.

Layout mirrors a broker's log segments:

    <root>/<topic>/partition=<p>/segment-<base_offset>.jsonl

Each line is one record ``{"offset": n, "key": k|null, "value": v,
"timestamp": ms}``; offsets are dense and ascending per partition, and
a segment file's name carries its base offset — exactly the structure
Kafka's own segment index provides, which is what makes bounded reads
seekable instead of scan-everything.

``read_kafka`` (io/readers.py) routes ``file://`` bootstrap servers
here, so the public API (reference: ``daft/io/_kafka.py:557`` —
bounded batch read only, no unbounded mode) is exercised end-to-end:
segment PRUNING happens driver-side from file names (only segments
whose offset range intersects the requested bounds are handed to
Spark — at broker scale this is the seek), the row-level bound is a
pushed filter, and the result schema matches Spark's Kafka source
(key/value binary, topic, partition, offset, timestamp,
timestampType).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEGMENT_RECORDS_DEFAULT = 500

_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


def write_topic_log(
    root: str,
    topic: str,
    df: DataFrame,
    partition_col: str,
    key_col: str | None,
    value_col: str,
    order_col: str,
    timestamp_col: str | None = None,
    segment_records: int = SEGMENT_RECORDS_DEFAULT,
) -> None:
    """Materialize ``df`` as a topic log: records land in partition
    ``partition_col`` ordered by ``order_col``; offsets are the dense
    per-partition ordinal. Runs through Spark's JSON writer partitioned
    by (partition, segment) so the layout is produced distributed, then
    segments are renamed to carry their base offset."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(partition_col).orderBy(order_col)
    recs = df.select(
        F.col(partition_col).cast("int").alias("__p"),
        (F.row_number().over(w) - 1).alias("offset"),
        (F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")).alias(
            "key"
        ),
        F.col(value_col).cast("string").alias("value"),
        (
            F.unix_micros(F.col(timestamp_col).cast("timestamp")) / 1000
            if timestamp_col
            else F.lit(0)
        ).cast("long").alias("timestamp"),
    ).withColumn("__seg", (F.col("offset") / F.lit(segment_records)).cast("long"))
    staging = os.path.join(root, f".staging-{topic}")
    (
        recs.repartition("__p", "__seg")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .partitionBy("__p", "__seg")
        .json(staging)
    )
    tdir = os.path.join(root, topic)
    for pdir in sorted(os.listdir(staging)):
        if not pdir.startswith("__p="):
            continue
        p = int(pdir.split("=", 1)[1])
        out_p = os.path.join(tdir, f"partition={p}")
        os.makedirs(out_p, exist_ok=True)
        for sdir in sorted(os.listdir(os.path.join(staging, pdir))):
            if not sdir.startswith("__seg="):
                continue
            seg = int(sdir.split("=", 1)[1])
            base = seg * segment_records
            parts = [
                f
                for f in os.listdir(os.path.join(staging, pdir, sdir))
                if f.endswith(".json")
            ]
            dst = os.path.join(out_p, f"segment-{base:020d}.jsonl")
            with open(dst, "w") as out:
                for f in sorted(parts):
                    with open(os.path.join(staging, pdir, sdir, f)) as src:
                        out.write(src.read())
    import shutil

    shutil.rmtree(staging, ignore_errors=True)


def _parse_offsets(spec, topic: str, partitions: list[int], side: str):
    """Kafka-style offsets: "earliest"/"latest" or JSON
    '{"topic": {"0": 100, ...}}'. Returns {partition: offset|None}
    (None = unbounded on that side). Matches the real batch source's
    JSON contract: -2 means earliest, -1 means latest; latest as a
    start or earliest as an end is rejected (same rule as the global
    string forms); every topic partition must appear in the spec."""
    if spec in ("earliest", "latest"):
        return {p: None for p in partitions}
    d = json.loads(spec) if isinstance(spec, str) else spec
    per = d.get(topic, {})
    out = {}
    for p in partitions:
        if str(p) not in per and p not in per:
            raise ValueError(
                f"{side}ingOffsets JSON must specify all partitions of "
                f"{topic!r}; missing partition {p}"
            )
        v = per.get(str(p), per.get(p))
        if v == -2:  # earliest
            if side == "end":
                raise ValueError(
                    'endingOffsets -2 ("earliest") is not allowed for batch queries'
                )
            v = None
        elif v == -1:  # latest
            if side == "start":
                raise ValueError(
                    'startingOffsets -1 ("latest") is not allowed for batch queries'
                )
            v = None
        out[p] = v
    return out


def read_kafka_log(
    root: str,
    topic: str,
    spark: SparkSession,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    segment_records: int = SEGMENT_RECORDS_DEFAULT,
) -> DataFrame:
    """Bounded read of a file-backed topic log with the Kafka source's
    schema. Start bound inclusive, end bound exclusive (Kafka
    semantics). Segment files outside the requested offset range are
    pruned by NAME before Spark sees them."""
    # Spark's Kafka BATCH source rejects these spec combinations; the
    # fake keeps the same contract so tests can't pass on semantics the
    # real source would refuse.
    if starting_offsets == "latest":
        raise ValueError('startingOffsets "latest" is not allowed for batch queries')
    if ending_offsets == "earliest":
        raise ValueError('endingOffsets "earliest" is not allowed for batch queries')
    tdir = os.path.join(root, topic)
    if not os.path.isdir(tdir):
        raise FileNotFoundError(f"no topic log at {tdir}")
    partitions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(tdir)
        if d.startswith("partition=")
    )
    starts = _parse_offsets(starting_offsets, topic, partitions, "start")
    ends = _parse_offsets(ending_offsets, topic, partitions, "end")
    out = None
    for p in partitions:
        pdir = os.path.join(tdir, f"partition={p}")
        segs = sorted(
            (int(re.match(r"segment-(\d+)\.jsonl$", f).group(1)), f)
            for f in os.listdir(pdir)
            if re.match(r"segment-(\d+)\.jsonl$", f)
        )
        lo, hi = starts.get(p), ends.get(p)
        keep = []
        for i, (base, fname) in enumerate(segs):
            nxt = segs[i + 1][0] if i + 1 < len(segs) else None
            if hi is not None and base >= hi:
                continue
            if lo is not None and nxt is not None and nxt <= lo:
                continue
            keep.append(os.path.join(pdir, fname))
        if not keep:
            continue
        df = spark.read.schema(_RECORD_SCHEMA).json(keep)
        if lo is not None:
            df = df.filter(F.col("offset") >= lo)
        if hi is not None:
            df = df.filter(F.col("offset") < hi)
        df = df.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            F.lit(p).cast("int").alias("partition"),
            F.col("offset"),
            F.timestamp_millis(F.col("timestamp")).alias("timestamp"),
            F.lit(0).cast("int").alias("timestampType"),
        )
        out = df if out is None else out.unionAll(df)
    if out is None:
        sch = T.StructType(
            [
                T.StructField("key", T.BinaryType()),
                T.StructField("value", T.BinaryType()),
                T.StructField("topic", T.StringType()),
                T.StructField("partition", T.IntegerType()),
                T.StructField("offset", T.LongType()),
                T.StructField("timestamp", T.TimestampType()),
                T.StructField("timestampType", T.IntegerType()),
            ]
        )
        return spark.createDataFrame([], sch)
    return out
