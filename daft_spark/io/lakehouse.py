"""Lakehouse / external-catalog readers.

Parity targets (reference ``daft/io/__init__.py:21-43``): read_iceberg
(``daft/io/iceberg/_iceberg.py:130``), read_deltalake
(``delta_lake/_deltalake.py:22``), read_hudi (``hudi/_hudi.py:18``),
read_paimon, read_lance (``lance/_lance.py:25``), read_huggingface
(``huggingface/__init__.py:38``), read_mcap (``mcap/_mcap.py:97``).

On Spark these are format plumbing: each maps to a DataSource (V2)
connector selected by ``spark.read.format(...)``. The connector JARs are
not bundled in this container, so each reader probes the format and
raises a single clear error naming the required package — the call
signature, option mapping, and return contract are the real product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from daft_spark.context import configure, get_or_create


def _session(spark: SparkSession | None) -> SparkSession:
    return configure(spark) if spark is not None else get_or_create()


def _format_read(spark: SparkSession, fmt: str, path_or_table: str, package_hint: str,
                 options: dict | None = None, is_table: bool = False) -> DataFrame:
    try:
        if is_table:
            return spark.table(path_or_table)
        reader = spark.read.format(fmt)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader.load(path_or_table)
    except Exception as e:  # ClassNotFound / data source not found
        msg = str(e)
        if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg or "ClassNotFound" in msg:
            raise ImportError(
                f"the '{fmt}' Spark connector is not on the classpath; add "
                f"--packages {package_hint} (or the equivalent spark.jars.packages conf)"
            ) from e
        raise


def read_deltalake(
    path: str,
    spark: SparkSession | None = None,
    version: int | None = None,
    timestamp_ms: int | None = None,
    **options,
) -> DataFrame:
    """reference read_deltalake (daft/io/delta_lake/_deltalake.py:22) ->
    spark.read.format('delta') when the connector is on the classpath,
    else the pure-Python log replay (daft_spark.io.delta) for local
    non-partitioned tables — mirroring the reference, which also reads
    Delta without a Spark connector (via delta-rs). ``version`` time
    travels; ``timestamp_ms`` is TIMESTAMP AS OF (delta-spark's
    timestampAsOf)."""
    spark = _session(spark)
    try:
        if version is not None:
            options = {**options, "versionAsOf": str(version)}
        if timestamp_ms is not None:
            import datetime as _dt

            # delta-spark parses a zone-less timestampAsOf in
            # spark.sql.session.timeZone, so format the instant in THAT
            # zone (with millis — no precision drop) rather than a UTC
            # wall-clock string; both the connector path and the pure
            # python fallback then resolve the same version (r8 advice).
            zone = spark.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
            try:
                from zoneinfo import ZoneInfo

                tz = ZoneInfo(zone)
            except Exception:
                import re as _re

                # Spark also accepts fixed-offset ids (GMT+8, UTC+08:00,
                # +05:30) that ZoneInfo can't parse
                m = _re.fullmatch(
                    r"(?:GMT|UTC)?([+-])(\d{1,2})(?::?(\d{2}))?", zone
                )
                if m:
                    sign = 1 if m.group(1) == "+" else -1
                    mins = int(m.group(2)) * 60 + int(m.group(3) or 0)
                    tz = _dt.timezone(sign * _dt.timedelta(minutes=mins))
                else:
                    tz = _dt.timezone.utc
            local = _dt.datetime.fromtimestamp(timestamp_ms / 1000, tz=tz)
            options = {
                **options,
                "timestampAsOf": local.strftime("%Y-%m-%d %H:%M:%S.")
                + f"{local.microsecond // 1000:03d}",
            }
        return _format_read(spark, "delta", path, "io.delta:delta-spark_2.13", options)
    except ImportError:
        import os

        from daft_spark.io.delta import read_deltalake_py

        if os.path.isdir(os.path.join(path, "_delta_log")):
            return read_deltalake_py(
                path, spark, version=version, timestamp_ms=timestamp_ms
            )
        raise


def read_iceberg(
    table: str,
    spark: SparkSession | None = None,
    snapshot_id: int | None = None,
    filters: list[tuple] | None = None,
    ref: str | None = None,
) -> DataFrame:
    """reference read_iceberg (daft/io/iceberg/_iceberg.py:130) ->
    Iceberg catalog table read when a catalog is configured; for a
    filesystem table path (a directory with metadata/), the pure-Python
    metadata walk (daft_spark.io.iceberg) — mirroring the reference,
    which also reads Iceberg without a Spark connector (via pyiceberg).
    Time travel via snapshot_id. ``filters`` =
    [(column, op, literal), ...] prunes manifest entries AND applies
    row-level (io/iceberg.py); for pushdown without manual plumbing use
    ``spark.read.format("daft_iceberg").option("path", ...)`` —
    registered by daft_spark.context.configure — whose pushFilters hook
    feeds Catalyst's own filters into the same pruning."""
    import os

    spark = _session(spark)
    if os.path.isdir(os.path.join(table, "metadata")):
        from daft_spark.io.iceberg import read_iceberg_py

        return read_iceberg_py(
            table, spark, snapshot_id=snapshot_id, filters=filters, ref=ref
        )
    try:
        if ref is not None:
            return spark.read.option("branch", ref).table(table)
        if snapshot_id is not None:
            return spark.read.option("snapshot-id", snapshot_id).table(table)
        return spark.table(table)
    except Exception as e:
        raise ImportError(
            "Iceberg requires org.apache.iceberg:iceberg-spark-runtime and a "
            "configured catalog (spark.sql.catalog.<name>), or a filesystem "
            "table path containing metadata/ for the pure-Python reader"
        ) from e


def read_hudi(
    path: str,
    spark: SparkSession | None = None,
    as_of: str | None = None,
    **options,
) -> DataFrame:
    """reference read_hudi (daft/io/hudi/_hudi.py:18) -> the Hudi Spark
    connector when present; for a local copy-on-write table directory
    (has .hoodie/), the pure-Python timeline replay
    (daft_spark.io.hudi) — mirroring the reference, which also reads
    Hudi without a connector. ``as_of`` pins the timeline to an instant
    (the as.of.instant read option)."""
    import os

    spark = _session(spark)
    if os.path.isdir(os.path.join(path, ".hoodie")):
        from daft_spark.io.hudi import read_hudi_py

        return read_hudi_py(path, spark, as_of=as_of)
    if as_of is not None:
        options = dict(options, **{"as.of.instant": as_of})
    return _format_read(spark, "hudi", path, "org.apache.hudi:hudi-spark-bundle_2.13", options)


def read_paimon(path: str, spark: SparkSession | None = None, snapshot: int | None = None, **options) -> DataFrame:
    """reference read_paimon (daft/io/__init__.py lakehouse set) -> the
    Paimon Spark connector when present; for a local filesystem table
    directory (has schema/), the pure-Python metadata walk
    (daft_spark.io.paimon). ``snapshot`` time travels."""
    import os

    spark = _session(spark)
    if os.path.isdir(os.path.join(path, "schema")):
        from daft_spark.io.paimon import read_paimon_py

        return read_paimon_py(path, spark, snapshot=snapshot)
    return _format_read(_session(spark), "paimon", path, "org.apache.paimon:paimon-spark", options)


def read_lance(path: str, spark: SparkSession | None = None, **options) -> DataFrame:
    return _format_read(_session(spark), "lance", path, "com.lancedb:lance-spark-bundle_2.13", options)


def read_huggingface(repo: str, spark: SparkSession | None = None, **options) -> DataFrame:
    """reference read_huggingface (daft/io/huggingface/__init__.py:38):
    'hf://datasets/<org>/<name>' -> the dataset's auto-converted parquet
    shards, read as ordinary multi-file parquet (pushdowns apply).

    Resolution order:
    1. A local mirror: $DAFT_SPARK_HF_MIRROR/<org>/<name>/**.parquet —
       the layout `huggingface_hub.snapshot_download` produces. This is
       the offline path (air-gapped clusters pre-stage datasets the
       same way).
    2. The public endpoint https://huggingface.co/api/datasets/<repo>/
       parquet — requires outbound network, absent in this container,
       so it raises with the exact URL a networked deployment would
       resolve.
    """
    import glob as _glob
    import os

    spark = _session(spark)
    if repo.startswith("hf://"):
        repo = repo[len("hf://") :]
    if repo.startswith("datasets/"):
        repo = repo[len("datasets/") :]
    mirror = os.environ.get("DAFT_SPARK_HF_MIRROR")
    if mirror:
        root = os.path.join(mirror, *repo.split("/"))
        shards = sorted(_glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))
        if not shards:
            raise FileNotFoundError(
                f"DAFT_SPARK_HF_MIRROR is set but no parquet shards under {root}"
            )
        return spark.read.parquet(*shards)
    url = f"https://huggingface.co/api/datasets/{repo}/parquet"
    raise NotImplementedError(
        f"read_huggingface needs outbound network access: resolve {url} to the "
        "dataset's parquet shard URLs, then spark.read.parquet(urls). Offline: "
        "set DAFT_SPARK_HF_MIRROR to a snapshot_download-style local root."
    )


def read_mcap(path: str, spark: SparkSession | None = None) -> DataFrame:
    """reference read_mcap (daft/io/mcap/_mcap.py:97, robotics log
    format): binaryFile + per-file pure-Python MCAP record parser
    (daft_spark.io.mcap), the same distributed shape as io/warc.py."""
    from daft_spark.io.mcap import read_mcap as _read_mcap

    return _read_mcap(path, spark)
