"""daft_spark.io — reader/writer surface (reference ``daft/io/``).

Re-exports every reference ``daft.io`` public name:

- Readers/writers live in sibling modules (readers, writers, delta,
  iceberg, hudi, paimon, sqldb, warc, mcap, lakehouse, custom_source).
- ``DataSource``/``DataSourceReader``/``InputPartition`` are Spark 4's
  own Python DataSource API — the reference's ScanOperator plug point
  maps onto it 1:1 (custom_source.py shows the bridge); ``DataSink`` is
  the foreachPartition push-sink contract (io/writers.py write_sink).
- The cloud *Config dataclasses mirror the reference's IOConfig
  children; on Spark, credentials are hadoop filesystem confs, so each
  config knows its conf prefix and ``apply()`` sets them on the live
  session.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.datasource import (  # noqa: F401 — the ScanOperator plug point
    DataSource,
    DataSourceReader,
    InputPartition,
)

# one task-per-partition handle, reference DataSourceTask naming
DataSourceTask = InputPartition


class DataSink:
    """Push-sink contract (reference daft/io/sink.py DataSink): override
    write_batch(rows) (and optionally open/close); execute with
    io.writers.write_sink / DataFrame.write_sink — one sink instance
    per partition, executor-side."""

    def open(self) -> None:  # pragma: no cover - optional hook
        pass

    def write_batch(self, rows) -> None:
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - optional hook
        pass

    def __call__(self, rows) -> None:
        """foreachPartition entry point."""
        self.open()
        try:
            self.write_batch(rows)
        finally:
            self.close()


@dataclass
class _HadoopConfig:
    """Base: a bag of options applied under a hadoop conf prefix."""

    options: dict = field(default_factory=dict)
    _PREFIX = ""

    def apply(self, spark=None) -> None:
        from daft_spark.context import get_or_create

        spark = spark or get_or_create()
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in self.options.items():
            hconf.set(self._PREFIX + k, str(v))


@dataclass
class S3Config(_HadoopConfig):
    """reference S3Config -> fs.s3a.* confs (s3a is Spark's S3 FS)."""

    region_name: str | None = None
    endpoint_url: str | None = None
    key_id: str | None = None
    access_key: str | None = None
    session_token: str | None = None
    anonymous: bool = False
    _PREFIX = "fs.s3a."

    def apply(self, spark=None) -> None:
        std = {
            "endpoint.region": self.region_name,
            "endpoint": self.endpoint_url,
            "access.key": self.key_id,
            "secret.key": self.access_key,
            "session.token": self.session_token,
        }
        self.options = {**{k: v for k, v in std.items() if v is not None}, **self.options}
        if self.anonymous:
            self.options["aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
            )
        super().apply(spark)


@dataclass
class S3Credentials:
    """reference S3Credentials — the key triple S3Config consumes."""

    key_id: str
    access_key: str
    session_token: str | None = None


@dataclass
class GCSConfig(_HadoopConfig):
    """reference GCSConfig -> fs.gs.* confs (GCS connector)."""

    project_id: str | None = None
    credentials: str | None = None
    anonymous: bool = False
    _PREFIX = "fs.gs."


@dataclass
class AzureConfig(_HadoopConfig):
    """reference AzureConfig -> fs.azure.* confs (ABFS)."""

    storage_account: str | None = None
    access_key: str | None = None
    sas_token: str | None = None
    _PREFIX = "fs.azure."


@dataclass
class HTTPConfig(_HadoopConfig):
    """reference HTTPConfig — user agent / retry knobs for http(s)
    reads; consumed by the url download stage."""

    user_agent: str | None = None
    bearer_token: str | None = None
    _PREFIX = "fs.http."


@dataclass
class HdfsConfig(_HadoopConfig):
    _PREFIX = "fs.hdfs."


@dataclass
class HuggingFaceConfig(_HadoopConfig):
    """reference HuggingFaceConfig — hf:// resolution options
    (read_huggingface; offline mirror via DAFT_SPARK_HF_MIRROR)."""

    token: str | None = None
    _PREFIX = "fs.hf."


@dataclass
class UnityConfig(_HadoopConfig):
    """reference UnityConfig — Unity Catalog endpoint/token (consumed
    by a spark.sql.catalog.* configuration at session build)."""

    endpoint: str | None = None
    token: str | None = None
    _PREFIX = "spark.sql.catalog.unity."


@dataclass
class GravitinoConfig(_HadoopConfig):
    endpoint: str | None = None
    metalake: str | None = None
    _PREFIX = "spark.sql.catalog.gravitino."


@dataclass
class CosConfig(_HadoopConfig):
    """Tencent COS (reference CosConfig) -> fs.cosn.* confs."""

    _PREFIX = "fs.cosn."


@dataclass
class TosConfig(_HadoopConfig):
    """Volcengine TOS (reference TosConfig) -> fs.tos.* confs."""

    _PREFIX = "fs.tos."


@dataclass
class GooseFSConfig(_HadoopConfig):
    _PREFIX = "fs.gfs."
