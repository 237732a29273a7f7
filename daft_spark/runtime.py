"""Runtime/context surface — parity with the reference's top-level
context management (reference ``daft/context.py`` get_context,
set_runner_native/set_runner_ray, set_execution_config,
set_planning_config, execution_config_ctx/planning_config_ctx;
``daft/session.py`` provider/model state; ``daft/__init__.py``
subscriber/extension hooks).

Spark mapping: the "runner" is the Spark master (local[N] = the
reference's native runner; a cluster master = its distributed runner),
and execution/planning configs are runtime-settable ``spark.conf``
entries — so these functions translate reference knobs onto the
equivalent Spark ones instead of holding a parallel config tree.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field
from typing import Any, Callable

from daft_spark.context import get_or_create

# reference execution-config knob -> Spark conf (the knobs with a real
# Spark equivalent; unknown knobs are accepted and recorded so config
# dumps round-trip, but only these change engine behavior)
_EXEC_CONF_MAP = {
    "shuffle_partitions": "spark.sql.shuffle.partitions",
    "broadcast_join_size_bytes_threshold": "spark.sql.autoBroadcastJoinThreshold",
    "parquet_target_filesize": "spark.sql.files.maxPartitionBytes",
    "scan_tasks_max_size_bytes": "spark.sql.files.maxPartitionBytes",
    "arrow_max_records_per_batch": "spark.sql.execution.arrow.maxRecordsPerBatch",
}
_PLAN_CONF_MAP = {
    "enable_aqe": "spark.sql.adaptive.enabled",
    "enable_cbo": "spark.sql.cbo.enabled",
}

_STATE: dict[str, Any] = {
    "model": None,
    "providers": {},          # alias -> Provider
    "current_provider": None, # alias
    "subscribers": {},        # alias -> subscriber object/callable
    "viz_hook": None,
    "recorded_config": {},    # knobs without a Spark equivalent
}


@dataclass
class DaftContext:
    """get_context() handle (reference daft.context.DaftContext)."""

    runner_type: str = "native"

    @property
    def spark(self):
        return get_or_create()

    def runner(self) -> str:
        return self.runner_type


_CONTEXT = DaftContext()


def get_context() -> DaftContext:
    return _CONTEXT


def get_or_infer_runner_type() -> str:
    """'native' for local[...] masters, 'distributed' otherwise —
    the reference's native/ray split mapped onto Spark masters."""
    master = get_or_create().conf.get("spark.master", "local[*]")
    return "native" if master.startswith("local") else "distributed"


def get_or_create_runner() -> DaftContext:
    _CONTEXT.runner_type = get_or_infer_runner_type()
    return _CONTEXT


def set_runner_native(**_opts) -> DaftContext:
    """The local[N] SparkSession IS the native runner; creates it if
    absent (reference set_runner_native)."""
    get_or_create()
    _CONTEXT.runner_type = "native"
    return _CONTEXT


def set_runner_ray(address: str | None = None, **_opts) -> DaftContext:
    """The reference's ray runner maps to a Spark cluster master; a
    Spark build with RayDP or a standalone/yarn/k8s master plays this
    role."""
    raise NotImplementedError(
        "distributed execution on Spark is selected by the session master "
        "(spark.master=spark://... | yarn | k8s://...), not per-call; start the "
        "session with that master (daft_spark.get_or_create(master=...))"
        + (f" — got ray address {address!r}" if address else "")
    )


def _apply_conf(mapping: dict, kwargs: dict) -> dict[str, str | None]:
    spark = get_or_create()
    prior: dict[str, str | None] = {}
    for k, v in kwargs.items():
        conf = mapping.get(k)
        if conf is None:
            _STATE["recorded_config"][k] = v
            continue
        try:
            prior[conf] = spark.conf.get(conf)
        except Exception:
            prior[conf] = None
        spark.conf.set(conf, str(v).lower() if isinstance(v, bool) else str(v))
    return prior


def set_execution_config(**kwargs) -> None:
    """reference set_execution_config — knobs translate onto runtime
    Spark confs (see _EXEC_CONF_MAP); unmapped knobs are recorded."""
    _apply_conf(_EXEC_CONF_MAP, kwargs)


def set_planning_config(**kwargs) -> None:
    _apply_conf(_PLAN_CONF_MAP, kwargs)


@contextlib.contextmanager
def execution_config_ctx(**kwargs):
    """Scoped set_execution_config (reference execution_config_ctx):
    confs restored on exit."""
    prior = _apply_conf(_EXEC_CONF_MAP, kwargs)
    try:
        yield
    finally:
        spark = get_or_create()
        for conf, v in prior.items():
            if v is not None:
                spark.conf.set(conf, v)


@contextlib.contextmanager
def planning_config_ctx(**kwargs):
    prior = _apply_conf(_PLAN_CONF_MAP, kwargs)
    try:
        yield
    finally:
        spark = get_or_create()
        for conf, v in prior.items():
            if v is not None:
                spark.conf.set(conf, v)


# ---------------------------------------------------------------------------
# model / provider session state (reference daft/session.py attach_provider
# set_model; backed by multimodal/provider.py's registry)


def attach_provider(provider, alias: str | None = None):
    """Register an AI provider (reference attach_provider). Accepts a
    Provider instance or a registry name ('deterministic', 'openai',
    'transformers', 'vllm', 'lm_studio')."""
    from daft_spark.multimodal.provider import Provider, load_provider

    if isinstance(provider, str):
        provider = load_provider(provider, name=alias)
    if not isinstance(provider, Provider):
        raise TypeError(f"expected Provider or registry name, got {type(provider)}")
    alias = alias or provider.name
    _STATE["providers"][alias] = provider
    if _STATE["current_provider"] is None:
        _STATE["current_provider"] = alias
    return provider


def detach_provider(alias: str) -> None:
    _STATE["providers"].pop(alias, None)
    if _STATE["current_provider"] == alias:
        _STATE["current_provider"] = next(iter(_STATE["providers"]), None)


def get_provider(alias: str | None = None):
    alias = alias or _STATE["current_provider"]
    if alias is None or alias not in _STATE["providers"]:
        raise KeyError(f"no provider attached under {alias!r}")
    return _STATE["providers"][alias]


def has_provider(alias: str) -> bool:
    return alias in _STATE["providers"]


def current_provider():
    return _STATE["providers"].get(_STATE["current_provider"])


def set_provider(alias: str) -> None:
    if alias not in _STATE["providers"]:
        raise KeyError(f"no provider attached under {alias!r}")
    _STATE["current_provider"] = alias


def set_model(model: str | None) -> None:
    """Session default model id (reference set_model)."""
    _STATE["model"] = model


def current_model() -> str | None:
    return _STATE["model"]


# ---------------------------------------------------------------------------
# observability (reference subscribers / metrics / viz hook)


def attach_subscriber(subscriber, alias: str | None = None):
    """Register a query-event subscriber (reference attach_subscriber).
    Spark's own event pipeline is the QueryExecutionListener /
    SparkListener; this registry is consulted by daft_spark surfaces
    and exposed to user code via with_subscriber."""
    alias = alias or getattr(subscriber, "name", None) or f"subscriber_{len(_STATE['subscribers'])}"
    _STATE["subscribers"][alias] = subscriber
    return subscriber


def detach_subscriber(alias: str) -> None:
    _STATE["subscribers"].pop(alias, None)


@contextlib.contextmanager
def with_subscriber(subscriber, alias: str | None = None):
    """Scoped subscriber attachment (reference with_subscriber)."""
    alias = alias or f"__scoped_{id(subscriber)}"
    attach_subscriber(subscriber, alias)
    try:
        yield subscriber
    finally:
        detach_subscriber(alias)


def subscribers() -> dict:
    return dict(_STATE["subscribers"])


def metrics() -> dict:
    """Engine metrics snapshot (reference daft.metrics) from Spark's
    status tracker — live semantics, driver-side only."""
    sc = get_or_create().sparkContext
    tracker = sc.statusTracker()
    return {
        "active_job_ids": list(tracker.getActiveJobsIds()),
        "active_stage_ids": list(tracker.getActiveStageIds()),
        "default_parallelism": sc.defaultParallelism,
        "application_id": sc.applicationId,
    }


def register_viz_hook(hook: Callable) -> None:
    """reference register_viz_hook — consulted by notebook repr paths."""
    _STATE["viz_hook"] = hook


def refresh_logger() -> None:
    """reference refresh_logger — re-sync the JVM log level with the
    Python root logger's."""
    import logging

    level = logging.getLogger().getEffectiveLevel()
    name = logging.getLevelName(level)
    if name in ("DEBUG", "INFO", "WARNING", "ERROR"):
        get_or_create().sparkContext.setLogLevel("WARN" if name == "WARNING" else name)


# ---------------------------------------------------------------------------
# extensions (reference load_extension — native cdylib plugins; Spark's
# equivalent is JVM jars on the classpath, fixed at session start)


def load_extension(path: str) -> None:
    raise NotImplementedError(
        "native extension cdylibs are a reference-engine mechanism; on Spark, "
        "add JVM extensions via spark.jars / spark.sql.extensions at session "
        "start (they cannot be loaded into a running JVM)"
    )


def get_loaded_extension_paths() -> list[str]:
    spark = get_or_create()
    jars = spark.conf.get("spark.jars", "")
    return [j for j in jars.split(",") if j]


def get_function(name: str):
    """Resolve a scalar function by name from the flat functions
    namespace (reference get_function)."""
    import daft_spark.functions as fns

    return getattr(fns, name)


def get_aggregate_function(name: str):
    import daft_spark.functions as fns

    fn = getattr(fns, name)
    return fn


# ---------------------------------------------------------------------------
# checkpoint configuration objects (reference daft checkpoint API; the
# executable semantics live in operators/checkpoint.py)


@dataclass
class KeyFilteringSettings:
    """Which key columns identify a row for resume filtering."""

    key_cols: list[str] = field(default_factory=list)


@dataclass
class CheckpointConfig:
    """Declarative checkpoint spec consumed by CheckpointStore."""

    path: str
    keys: KeyFilteringSettings | list[str] = field(default_factory=list)
    output_format: str = "parquet"

    def key_cols(self) -> list[str]:
        return self.keys.key_cols if isinstance(self.keys, KeyFilteringSettings) else list(self.keys)


@dataclass
class ResourceRequest:
    """Per-UDF resource hints (reference ResourceRequest). On Spark,
    resources are task-level (spark.task.cpus / resource profiles);
    accepted for API compatibility and surfaced to schedulers that
    honor stage-level scheduling."""

    num_cpus: float | None = None
    num_gpus: float | None = None
    memory_bytes: int | None = None


@dataclass
class IOConfig:
    """Cloud-credentials bundle (reference IOConfig: S3/GCS/Azure
    configs). On Spark these land in hadoop confs; apply() sets them
    on the active session."""

    s3: dict | None = None
    gcs: dict | None = None
    azure: dict | None = None

    def apply(self) -> None:
        spark = get_or_create()
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for prefix, block in (("fs.s3a.", self.s3), ("fs.gs.", self.gcs), ("fs.azure.", self.azure)):
            for k, v in (block or {}).items():
                hconf.set(prefix + k, str(v))


class CheckpointStore:
    """Resume-aware writer over a checkpoint location (reference
    CheckpointStore): filter_unprocessed drops rows already written;
    commit appends the remainder."""

    def __init__(self, config: CheckpointConfig):
        self.config = config

    def filter_unprocessed(self, df):
        from daft_spark.operators.checkpoint import skip_existing

        sdf = df._sdf if hasattr(df, "_sdf") else df
        return type(df)(skip_existing(sdf, self.config.path, self.config.key_cols())) \
            if hasattr(df, "_sdf") else skip_existing(df, self.config.path, self.config.key_cols())

    def commit(self, df) -> None:
        from daft_spark.operators.checkpoint import checkpointed_write

        sdf = df._sdf if hasattr(df, "_sdf") else df
        checkpointed_write(sdf, self.config.path, self.config.key_cols())


class IdempotentCommit:
    """Context manager tying a pipeline run to a CheckpointStore
    (reference IdempotentCommit): enter -> the store, rerunning after a
    partial failure only processes unwritten keys."""

    def __init__(self, config: CheckpointConfig):
        self.store = CheckpointStore(config)

    def __enter__(self) -> CheckpointStore:
        return self.store

    def __exit__(self, *exc) -> bool:
        return False
