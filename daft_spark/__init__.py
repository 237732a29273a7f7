"""daft_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Eventual-Inc/Daft reference,
re-expressed Spark-first (SURVEY.md is the blueprint).

Top-level surface mirrors ``daft``'s: readers, from_* constructors,
col/lit, sql, DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql.functions import col, lit

from daft_spark.context import configure, get_or_create
from daft_spark.dataframe import DataFrame, GroupedDataFrame
from daft_spark.sql import Catalog, Identifier, Session, Table, session, sql, sql_expr

__version__ = "0.1.0"


def _wrap(sdf) -> DataFrame:
    return DataFrame(sdf)


def read_parquet(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_parquet as _rp

    return _wrap(_rp(path, **kw))


def read_csv(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_csv as _rc

    return _wrap(_rc(path, **kw))


def read_json(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_json as _rj

    return _wrap(_rj(path, **kw))


def read_text(path, **kw) -> DataFrame:
    from daft_spark.io.readers import read_text as _rt

    return _wrap(_rt(path, **kw))


def read_sql(query, url, **kw) -> DataFrame:
    from daft_spark.io.readers import read_sql as _rs

    return _wrap(_rs(query, url, **kw))


def read_kafka(bootstrap_servers, topic, **kw) -> DataFrame:
    from daft_spark.io.readers import read_kafka as _rk

    return _wrap(_rk(bootstrap_servers, topic, **kw))


def read_warc(path, **kw) -> DataFrame:
    from daft_spark.io.warc import read_warc as _rw

    return _wrap(_rw(path, **kw))


def read_deltalake(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_deltalake as _rd

    return _wrap(_rd(path, **kw))


def read_iceberg(table, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_iceberg as _ri

    return _wrap(_ri(table, **kw))


def read_hudi(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_hudi as _rh

    return _wrap(_rh(path, **kw))


def read_lance(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_lance as _rl

    return _wrap(_rl(path, **kw))


def read_huggingface(repo, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_huggingface as _rhf

    return _wrap(_rhf(repo, **kw))


def read_mcap(path, **kw) -> DataFrame:
    from daft_spark.io.mcap import read_mcap as _rm

    return _wrap(_rm(path, **kw))


def from_pydict(data, **kw) -> DataFrame:
    from daft_spark.io.readers import from_pydict as _fp

    return _wrap(_fp(data, **kw))


def from_pandas(pdf, **kw) -> DataFrame:
    from daft_spark.io.readers import from_pandas as _fp

    return _wrap(_fp(pdf, **kw))


def from_arrow(tbl, **kw) -> DataFrame:
    from daft_spark.io.readers import from_arrow as _fa

    return _wrap(_fa(tbl, **kw))


def from_glob_path(pattern, **kw) -> DataFrame:
    from daft_spark.io.readers import from_glob_path as _fg

    return _wrap(_fg(pattern, **kw))


def range(start, end=None, step: int = 1, partitions=None) -> DataFrame:  # noqa: A001
    """Python-range semantics (reference daft/io/_range.py):
    ``range(5)`` -> 0..4, ``range(2, 10)`` -> 2..9."""
    from daft_spark.io.readers import range_

    if end is None:
        start, end = 0, start
    return _wrap(range_(start, end, step, partitions))


def read_paimon(path, **kw) -> DataFrame:
    from daft_spark.io.lakehouse import read_paimon as _rp

    return _wrap(_rp(path, **kw))


def read_video_frames(path, sample_every: int = 10, **kw) -> DataFrame:
    """reference read_video_frames (daft/io/av/__init__.py:25):
    binaryFile listing + the frame-sampling fan-out stage."""
    from daft_spark.multimodal.av import video_frames

    spark = get_or_create()
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _wrap(video_frames(files, "path", "content", sample_every=sample_every, **kw))


def from_pylist(rows: list, **kw) -> DataFrame:
    """List of dicts -> DataFrame (reference daft.from_pylist)."""
    cols: dict = {}
    for r in rows:
        for k in r:
            cols.setdefault(k, [])
    for r in rows:
        for k in cols:
            cols[k].append(r.get(k))
    return from_pydict(cols, **kw)


def from_files(pattern: str, **kw) -> DataFrame:
    """Glob -> one typed-file row per match (reference daft.from_files):
    the listing plus a File struct column."""
    from daft_spark.functions.files import file as _file

    listing = from_glob_path(pattern, **kw)
    return _wrap(listing._sdf.withColumn("file", _file("path")))


def from_dask_dataframe(ddf) -> DataFrame:
    """reference from_dask_dataframe — requires dask."""
    try:
        import dask  # noqa: F401
    except ImportError as e:
        raise ImportError("from_dask_dataframe requires the 'dask' package") from e
    return from_pandas(ddf.compute())


def from_ray_dataset(ds) -> DataFrame:
    """reference from_ray_dataset — requires ray."""
    try:
        import ray  # noqa: F401
    except ImportError as e:
        raise ImportError("from_ray_dataset requires the 'ray' package") from e
    return from_arrow(ds.to_arrow_refs())


def concat(*dfs: DataFrame) -> DataFrame:
    """Row-wise concatenation of DataFrames (reference daft.concat) —
    unionByName so column order differences don't corrupt rows."""
    if not dfs:
        raise ValueError("concat needs at least one DataFrame")
    out = dfs[0]._sdf if isinstance(dfs[0], DataFrame) else dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d._sdf if isinstance(d, DataFrame) else d)
    return _wrap(out)


def open_file(path: str):
    """reference daft.open_file — a typed local File handle."""
    from daft_spark.types import File

    return File(path)


def interval(**units) -> Column:
    """Interval literal (reference daft.interval):
    interval(days=3, hours=2) -> a DayTimeInterval/YearMonth expr."""
    from pyspark.sql import functions as F

    parts = []
    for unit in ("years", "months", "weeks", "days", "hours", "minutes", "seconds", "milliseconds", "microseconds"):
        v = units.pop(unit, None)
        if v:
            parts.append(f"INTERVAL {int(v)} {unit[:-1].upper()}{'S' if abs(int(v)) != 1 else ''}")
    if units:
        raise ValueError(f"unknown interval units {sorted(units)}")
    if not parts:
        return F.expr("INTERVAL 0 SECONDS")
    expr = F.expr(parts[0])
    for p in parts[1:]:
        expr = expr + F.expr(p)
    return expr


def element() -> Column:
    """reference daft.element — the per-element placeholder inside list
    expressions. Spark's higher-order functions take Python lambdas
    instead (``functions.list_map(col, lambda x: x + 1)``), which bind
    the element variable explicitly."""
    raise NotImplementedError(
        "Spark expresses per-element logic as lambdas to higher-order "
        "functions: use functions.list_map(col, lambda x: ...) / F.transform"
    )


def read_table(identifier, **options) -> DataFrame:
    """Session-catalog table read (reference daft.read_table)."""
    return session().read_table(identifier, **options)


def write_table(df, identifier, mode: str = "append") -> None:
    """Session-catalog table write (reference daft.write_table)."""
    session().get_table(identifier).write(
        df._sdf if isinstance(df, DataFrame) else df, mode=mode
    )


# --- session-state delegates (reference daft/__init__.py re-exports the
# default session's methods at the top level; same here) ---------------------


def _session_delegate(name):
    def call(*a, **kw):
        return getattr(session(), name)(*a, **kw)

    call.__name__ = name
    call.__doc__ = f"Default-session delegate (reference daft.{name} -> Session.{name})."
    return call


attach = _session_delegate("attach")
attach_catalog = _session_delegate("attach_catalog")
attach_table = _session_delegate("attach_table")
attach_view = _session_delegate("attach_view")
attach_function = _session_delegate("attach_function")
detach_catalog = _session_delegate("detach_catalog")
detach_table = _session_delegate("detach_table")
detach_function = _session_delegate("detach_function")
create_namespace = _session_delegate("create_namespace")
create_namespace_if_not_exists = _session_delegate("create_namespace_if_not_exists")
create_table = _session_delegate("create_table")
create_table_if_not_exists = _session_delegate("create_table_if_not_exists")
create_temp_table = _session_delegate("create_temp_table")
create_temp_view = _session_delegate("create_temp_view")
drop_namespace = _session_delegate("drop_namespace")
drop_table = _session_delegate("drop_table")
get_catalog = _session_delegate("get_catalog")
get_table = _session_delegate("get_table")
has_catalog = _session_delegate("has_catalog")
has_namespace = _session_delegate("has_namespace")
has_table = _session_delegate("has_table")
list_catalogs = _session_delegate("list_catalogs")
list_tables = _session_delegate("list_tables")
set_catalog = _session_delegate("set_catalog")
set_namespace = _session_delegate("set_namespace")


def current_catalog():
    return session().current_catalog()


def current_namespace():
    return session().current_namespace()


def current_session():
    """reference daft.current_session — the default Session singleton."""
    return session()


def set_session(s) -> None:
    """reference daft.set_session — replace the default session."""
    import daft_spark.session as _sess_mod

    _sess_mod._DEFAULT_SESSION = s


# --- runtime/context surface (daft_spark.runtime) ----------------------------

from daft_spark.runtime import (  # noqa: E402, F401
    CheckpointConfig,
    CheckpointStore,
    DaftContext,
    IOConfig,
    IdempotentCommit,
    KeyFilteringSettings,
    ResourceRequest,
    attach_provider,
    attach_subscriber,
    current_model,
    current_provider,
    detach_provider,
    detach_subscriber,
    execution_config_ctx,
    get_aggregate_function,
    get_context,
    get_function,
    get_loaded_extension_paths,
    get_or_create_runner,
    get_or_infer_runner_type,
    get_provider,
    has_provider,
    load_extension,
    metrics,
    planning_config_ctx,
    refresh_logger,
    register_viz_hook,
    set_execution_config,
    set_model,
    set_planning_config,
    set_provider,
    set_runner_native,
    set_runner_ray,
    with_subscriber,
)

# --- type surface ------------------------------------------------------------

from daft_spark.types import (  # noqa: E402, F401
    AudioFile,
    DataType,
    Expression,
    File,
    Hdf5File,
    ImageFile,
    ImageFormat,
    ImageMode,
    ImageProperty,
    MediaType,
    Schema,
    Series,
    TimeUnit,
    UnionMode,
    VideoFile,
)

# --- UDF decorators + submodule handles --------------------------------------

from pyspark.sql import Window  # noqa: E402, F401

from daft_spark import functions, io, runtime as runners  # noqa: E402, F401
from daft_spark import datasets  # noqa: E402, F401
from daft_spark.udf import cls, func, method, udaf  # noqa: E402, F401
from daft_spark import udf  # noqa: E402, F401

# attach the reference Expression method surface to pyspark Column
from daft_spark import expressions as _expressions  # noqa: E402, F401


__all__ = [
    "Catalog",
    "Column",
    "DataFrame",
    "GroupedDataFrame",
    "Identifier",
    "Session",
    "Table",
    "session",
    "col",
    "configure",
    "from_arrow",
    "from_glob_path",
    "from_pandas",
    "from_pydict",
    "get_or_create",
    "lit",
    "range",
    "read_csv",
    "read_deltalake",
    "read_hudi",
    "read_huggingface",
    "read_iceberg",
    "read_json",
    "read_kafka",
    "read_lance",
    "read_mcap",
    "read_parquet",
    "read_sql",
    "read_text",
    "read_warc",
    "sql",
    "sql_expr",
]
