"""Daft-style DataFrame API over pyspark.sql.DataFrame.

Parity surface: ``daft/dataframe/dataframe.py`` (~6,500 LoC). Methods
keep the reference's names/semantics but delegate 1:1 to the Spark
DataFrame so every operation stays declarative — Catalyst sees the full
plan (predicate pushdown, column pruning, join reordering, AQE).

Expressions are plain ``pyspark.sql.Column`` objects (``daft_spark.col``
/ ``daft_spark.lit``) — the reference's Expression tree
(``src/daft-dsl/src/expr/mod.rs:222``) maps onto Column operator
overloads directly, so no wrapper class is needed.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F


def _unwrap(df):
    return df._sdf if isinstance(df, DataFrame) else df


class DataFrame:
    """Lazy DataFrame with the reference's method surface."""

    def __init__(self, sdf: SparkDataFrame):
        self._sdf = sdf

    # --- plan-building (all lazy) ------------------------------------------
    def select(self, *exprs) -> "DataFrame":
        return DataFrame(self._sdf.select(*exprs))

    def exclude(self, *names: str) -> "DataFrame":
        return DataFrame(self._sdf.drop(*names))

    def where(self, predicate) -> "DataFrame":
        if isinstance(predicate, str):
            predicate = F.expr(predicate)
        return DataFrame(self._sdf.filter(predicate))

    filter = where

    def with_column(self, name: str, expr) -> "DataFrame":
        return DataFrame(self._sdf.withColumn(name, expr))

    def with_columns(self, cols: dict[str, Column]) -> "DataFrame":
        return DataFrame(self._sdf.withColumns(cols))

    def with_column_renamed(self, old: str, new: str) -> "DataFrame":
        return DataFrame(self._sdf.withColumnRenamed(old, new))

    def with_columns_renamed(self, mapping: dict[str, str]) -> "DataFrame":
        return DataFrame(self._sdf.withColumnsRenamed(mapping))

    def cast_to_schema(self, schema) -> "DataFrame":
        sdf = self._sdf
        for field in schema.fields:
            if field.name in sdf.columns:
                sdf = sdf.withColumn(field.name, F.col(field.name).cast(field.dataType))
        return DataFrame(sdf)

    def sort(self, by, desc: bool | list[bool] = False, nulls_first=None) -> "DataFrame":
        cols = by if isinstance(by, (list, tuple)) else [by]
        descs = desc if isinstance(desc, (list, tuple)) else [desc] * len(cols)
        nf = nulls_first if isinstance(nulls_first, (list, tuple)) else [nulls_first] * len(cols)
        order = []
        for c, d, n in zip(cols, descs, nf):
            col = F.col(c) if isinstance(c, str) else c
            # Daft default: nulls last for asc, nulls first for desc
            # (reference ops/sort.rs per-key descending+nulls_first flags)
            if n is None:
                n = bool(d)
            if d:
                order.append(col.desc_nulls_first() if n else col.desc_nulls_last())
            else:
                order.append(col.asc_nulls_first() if n else col.asc_nulls_last())
        return DataFrame(self._sdf.orderBy(*order))

    def limit(self, n: int) -> "DataFrame":
        return DataFrame(self._sdf.limit(n))

    def offset(self, n: int) -> "DataFrame":
        return DataFrame(self._sdf.offset(n))

    def distinct(self, *cols: str) -> "DataFrame":
        if cols:
            return DataFrame(self._sdf.dropDuplicates(list(cols)))
        return DataFrame(self._sdf.distinct())

    unique = distinct
    drop_duplicates = distinct

    def sample(self, fraction: float, with_replacement: bool = False,
               seed: int | None = None) -> "DataFrame":
        return DataFrame(self._sdf.sample(with_replacement, fraction, seed))

    def repartition(self, num: int | None, *cols) -> "DataFrame":
        """Hash repartition (reference ops/repartition.rs)."""
        if cols:
            return DataFrame(self._sdf.repartition(num, *cols) if num else self._sdf.repartition(*cols))
        return DataFrame(self._sdf.repartition(num))

    def into_partitions(self, num: int) -> "DataFrame":
        """Split/coalesce without a full shuffle (reference
        ops/into_partitions.rs)."""
        return DataFrame(self._sdf.coalesce(num))

    def shuffle(self, seed: int | None = None) -> "DataFrame":
        """Seeded random global shuffle (reference dataframe.py:3799) =
        repartition by rand(seed)."""
        n = self._sdf.sparkSession.sparkContext.defaultParallelism
        return DataFrame(self._sdf.repartition(n, F.rand(seed)))

    def join(
        self,
        other: "DataFrame | SparkDataFrame",
        on=None,
        left_on=None,
        right_on=None,
        how: str = "inner",
        strategy: str | None = None,
        prefix: str | None = None,
        suffix: str | None = None,
    ) -> "DataFrame":
        """reference dataframe.py:3869-3894 join surface; ``strategy``
        maps to Spark join hints (SURVEY §2.4).

        Column deconfliction matches the reference: duplicate non-join-key
        right columns are renamed with ``prefix``/``suffix`` (default
        prefix ``"right."`` when neither is given)."""
        right = _unwrap(other)
        how = {"outer": "full", "anti": "left_anti", "semi": "left_semi"}.get(how, how)

        # Resolve right-side join-key names (those merge/are comparable and
        # are never renamed; reference renames only non-join-key collisions).
        if left_on is not None:
            rkeys = right_on if isinstance(right_on, (list, tuple)) else [right_on]
            if all(isinstance(k, str) for k in rkeys):
                right_key_names = set(rkeys)
            else:
                # Column-valued join keys are bound to the pre-rename
                # plan — renaming the right side would unbind them, so
                # treat this like the Column-condition case.
                right_key_names = None
        elif isinstance(on, str):
            right_key_names = {on}
        elif isinstance(on, (list, tuple)) and all(isinstance(c, str) for c in on):
            right_key_names = set(on)
        else:
            right_key_names = None  # Column condition — can't rename safely
        if how not in ("left_semi", "left_anti"):
            overlap = [] if right_key_names is None else sorted(
                (set(self._sdf.columns) & set(right.columns)) - right_key_names
            )
            if right_key_names is None and (prefix is not None or suffix is not None):
                raise NotImplementedError(
                    "prefix/suffix deconfliction requires string join keys "
                    "(on=/left_on=/right_on= as column names), not a Column condition"
                )
            if overlap:
                if prefix is None and suffix is None:
                    prefix = "right."
                right = right.withColumnsRenamed(
                    {c: f"{prefix or ''}{c}{suffix or ''}" for c in overlap}
                )

        if strategy:
            hint = {"broadcast": "broadcast", "sort_merge": "merge", "hash": "shuffle_hash"}[strategy]
            right = right.hint(hint)
        if left_on is not None:
            lcond = [left_on] if isinstance(left_on, (str, Column)) else list(left_on)
            rcond = [right_on] if isinstance(right_on, (str, Column)) else list(right_on)
            cond = None
            for lc, rc in zip(lcond, rcond):
                lcol = self._sdf[lc] if isinstance(lc, str) else lc
                rcol = right[rc] if isinstance(rc, str) else rc
                piece = lcol == rcol
                cond = piece if cond is None else (cond & piece)
            return DataFrame(self._sdf.join(right, cond, how))
        return DataFrame(self._sdf.join(right, on, how))

    def cross_join(self, other) -> "DataFrame":
        return DataFrame(self._sdf.crossJoin(_unwrap(other)))

    def join_asof(self, other, on: str, by=None, strategy: str = "backward") -> "DataFrame":
        from daft_spark.operators.asof_join import join_asof

        return DataFrame(join_asof(self._sdf, _unwrap(other), on=on, by=by, strategy=strategy))

    def concat(self, other) -> "DataFrame":
        return DataFrame(self._sdf.unionAll(_unwrap(other)))

    def union(self, other) -> "DataFrame":
        return DataFrame(self._sdf.unionAll(_unwrap(other)).distinct())

    def union_all(self, other) -> "DataFrame":
        return DataFrame(self._sdf.unionAll(_unwrap(other)))

    def union_by_name(self, other) -> "DataFrame":
        return DataFrame(
            self._sdf.unionByName(_unwrap(other), allowMissingColumns=True)
        )

    def intersect(self, other) -> "DataFrame":
        return DataFrame(self._sdf.intersect(_unwrap(other)))

    def intersect_all(self, other) -> "DataFrame":
        return DataFrame(self._sdf.intersectAll(_unwrap(other)))

    def except_distinct(self, other) -> "DataFrame":
        return DataFrame(self._sdf.subtract(_unwrap(other)))

    def except_all(self, other) -> "DataFrame":
        return DataFrame(self._sdf.exceptAll(_unwrap(other)))

    def explode(self, *cols, index_column: str | None = None,
                ignore_empty_and_null: bool = False) -> "DataFrame":
        """Explode list column(s), reference dataframe.py:4239-4256
        semantics: multiple columns explode in LOCKSTEP (each row must
        contain the same number of items in every listed column — ragged
        rows raise), null/empty lists yield one null row by default and
        are dropped with ``ignore_empty_and_null=True``, and
        ``index_column`` appends the element's position in its list.

        Spark-first: ``posexplode[_outer](arrays_zip(cols...))`` then
        struct unpack — one generator node, no per-column cross product.
        """
        sdf = self._sdf
        names = [c if isinstance(c, str) else sdf.select(c).columns[0] for c in cols]
        if len(names) == 1:
            zipped = F.col(names[0])
        else:
            sizes = [F.coalesce(F.size(F.col(n)), F.lit(0)) for n in names]
            all_eq = None
            for s in sizes[1:]:
                eq = s == sizes[0]
                all_eq = eq if all_eq is None else (all_eq & eq)
            zipped = F.when(all_eq, F.arrays_zip(*[F.col(n) for n in names])).otherwise(
                F.raise_error(F.lit(
                    "DataFrame.explode: columns must contain the same number "
                    f"of items in each row: {names}"))
            )
        gen = F.posexplode(zipped) if ignore_empty_and_null else F.posexplode_outer(zipped)
        other = [c for c in sdf.columns if c not in names]
        ex = sdf.select(*other, gen.alias("_pos", "_elem"))
        if len(names) == 1:
            unpacked = {names[0]: F.col("_elem")}
        else:
            unpacked = {n: F.col("_elem").getField(n) for n in names}
        out_cols = [unpacked[c].alias(c) if c in unpacked else F.col(c) for c in sdf.columns]
        if index_column is not None:
            out_cols.append(F.col("_pos").alias(index_column))
        return DataFrame(ex.select(*out_cols))

    def unpivot(self, ids, values, variable_name="variable", value_name="value") -> "DataFrame":
        return DataFrame(self._sdf.unpivot(ids, values, variable_name, value_name))

    melt = unpivot

    def pivot(self, group_by, pivot_col: str, value_col: str, agg: str, names=None) -> "DataFrame":
        g = group_by if isinstance(group_by, (list, tuple)) else [group_by]
        agg_fn = getattr(F, {"sum": "sum", "mean": "avg", "avg": "avg", "min": "min",
                             "max": "max", "count": "count"}[agg])
        p = self._sdf.groupBy(*g).pivot(pivot_col, names)
        return DataFrame(p.agg(agg_fn(value_col)))

    def transform(self, fn, *args, **kwargs) -> "DataFrame":
        """reference pipe/transform (dataframe.py:273)."""
        out = fn(self, *args, **kwargs)
        return out if isinstance(out, DataFrame) else DataFrame(out)

    pipe = transform

    def add_monotonically_increasing_id(self, column_name: str = "id") -> "DataFrame":
        return DataFrame(self._sdf.withColumn(column_name, F.monotonically_increasing_id()))

    # --- aggregation --------------------------------------------------------
    def groupby(self, *cols) -> "GroupedDataFrame":
        return GroupedDataFrame(self._sdf.groupBy(*cols))

    group_by = groupby

    def agg(self, *exprs) -> "DataFrame":
        return DataFrame(self._sdf.agg(*exprs))

    def _agg_all(self, fn) -> "DataFrame":
        num = [f.name for f in self._sdf.schema.fields
               if f.dataType.typeName() in ("integer", "long", "double", "float", "short", "byte", "decimal")]
        return DataFrame(self._sdf.agg(*[fn(c).alias(c) for c in num]))

    def sum(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.sum(c).alias(c) for c in cols])) if cols else self._agg_all(F.sum)

    def mean(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.avg(c).alias(c) for c in cols])) if cols else self._agg_all(F.avg)

    def min(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.min(c).alias(c) for c in cols])) if cols else self._agg_all(F.min)

    def max(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.max(c).alias(c) for c in cols])) if cols else self._agg_all(F.max)

    def stddev(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.stddev(c).alias(c) for c in cols])) if cols else self._agg_all(F.stddev)

    def count_rows(self) -> int:
        return self._sdf.count()

    def describe(self) -> "DataFrame":
        return DataFrame(self._sdf.describe())

    def summarize(self) -> "DataFrame":
        return DataFrame(self._sdf.summary())

    # --- execution ----------------------------------------------------------
    def collect(self) -> "DataFrame":
        """Materialize (reference collect caches the result; we cache +
        trigger)."""
        self._sdf = self._sdf.cache()
        self._sdf.count()
        return self

    def show(self, n: int = 8) -> None:
        self._sdf.show(n, truncate=False)

    def explain(self, show_all: bool = False) -> None:
        self._sdf.explain("formatted" if show_all else "simple")

    def to_pydict(self) -> dict[str, list]:
        rows = self._sdf.collect()
        return {c: [r[c] for r in rows] for c in self._sdf.columns}

    def to_pylist(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self._sdf.collect()]

    def to_pandas(self):
        return self._sdf.toPandas()

    def to_arrow(self):
        """Spark 4 native Arrow export — exact for nested/decimal/
        timestamp types (no pandas round-trip)."""
        return self._sdf.toArrow()

    def iter_rows(self) -> Iterable[dict[str, Any]]:
        for r in self._sdf.toLocalIterator():
            yield r.asDict(recursive=True)

    def iter_partitions(self):
        yield from self._sdf.toLocalIterator(prefetchPartitions=True)

    # --- io -----------------------------------------------------------------
    def write_parquet(self, path: str, partition_cols=None, write_mode: str = "append",
                      compression: str = "snappy") -> None:
        from daft_spark.io.writers import write_parquet

        write_parquet(self._sdf, path, partition_cols=partition_cols,
                      write_mode=write_mode, compression=compression)

    def write_csv(self, path: str, partition_cols=None, write_mode: str = "append") -> None:
        from daft_spark.io.writers import write_csv

        write_csv(self._sdf, path, partition_cols=partition_cols, write_mode=write_mode)

    def write_json(self, path: str, write_mode: str = "append") -> None:
        from daft_spark.io.writers import write_json

        write_json(self._sdf, path, write_mode=write_mode)

    def write_deltalake(self, path: str, mode: str = "append",
                        partition_by: list[str] | None = None) -> None:
        """reference DataFrame.write_deltalake (dataframe.py:1767) —
        delta-spark when on the classpath, else the pure-python
        transaction-log writer (io/delta.py)."""
        from daft_spark.io.writers import write_deltalake

        write_deltalake(self._sdf, path, write_mode=mode, partition_by=partition_by)

    def write_iceberg(self, table: str, mode: str = "append",
                      partition_by: list[str] | None = None,
                      sort_by: list[str] | None = None) -> None:
        """reference DataFrame.write_iceberg (dataframe.py:1330) —
        catalog tables via writeTo; filesystem paths via the
        pure-python v2 commit writer (io/iceberg.py)."""
        from daft_spark.io.writers import write_iceberg

        write_iceberg(self._sdf, table, write_mode=mode,
                      partition_by=partition_by, sort_by=sort_by)

    def write_hudi(self, path: str, mode: str = "append",
                   partition_by: list[str] | None = None) -> None:
        """Hudi copy-on-write commit (io/hudi.py) — Spark-side analogue
        of the reference's Hudi write support."""
        from daft_spark.io.hudi import write_hudi_py

        write_hudi_py(self._sdf, path, mode=mode, partition_by=partition_by)

    def write_paimon(self, path: str, mode: str = "append",
                     partition_by: list[str] | None = None,
                     primary_key: list[str] | None = None,
                     delete: bool = False) -> None:
        """Paimon table commit (io/paimon.py) — append-only or, with
        ``primary_key``, upsert/delete with merge-on-read; Spark-side
        analogue of the reference's Paimon lakehouse support."""
        from daft_spark.io.paimon import write_paimon_py

        write_paimon_py(self._sdf, path, mode=mode, partition_by=partition_by,
                        primary_key=primary_key, delete=delete)

    def write_sink(self, sink_fn) -> None:
        """reference DataFrame.write_sink (dataframe.py:2267) —
        foreachPartition push-sink contract; see also io.writers.
        write_turbopuffer/write_clickhouse/write_bigtable."""
        from daft_spark.io.writers import write_sink

        write_sink(self._sdf, sink_fn)

    def write_sql(self, table: str, url: str, mode: str = "append", **options) -> None:
        """reference DataFrame.write_sql (dataframe.py:911) — JDBC, or
        the pure-python sqlite:// path (io/sqldb.py)."""
        from daft_spark.io.writers import write_sql

        write_sql(self._sdf, table, url, write_mode=mode, **options)

    def write_lance(self, path: str, **opts) -> None:
        from daft_spark.io.writers import write_lance

        write_lance(self._sdf, path, **opts)

    def write_turbopuffer(self, namespace: str, **opts) -> None:
        from daft_spark.io.writers import write_turbopuffer

        write_turbopuffer(self._sdf, namespace, **opts)

    def write_clickhouse(self, table: str, **opts) -> None:
        from daft_spark.io.writers import write_clickhouse

        write_clickhouse(self._sdf, table, **opts)

    def write_bigtable(self, table: str, **opts) -> None:
        from daft_spark.io.writers import write_bigtable

        write_bigtable(self._sdf, table, **opts)

    def write_huggingface(self, repo: str, **_opts) -> None:
        """reference DataFrame.write_huggingface (dataframe.py:2598) —
        pushes parquet shards to the Hub. Offline symmetric path: when
        $DAFT_SPARK_HF_MIRROR is set, shards land in the same
        snapshot layout read_huggingface resolves
        (<mirror>/<org>/<name>/**.parquet), so write->read roundtrips
        air-gapped; the networked path needs huggingface_hub."""
        import os

        if repo.startswith("hf://"):
            repo = repo[len("hf://"):]
        if repo.startswith("datasets/"):
            repo = repo[len("datasets/"):]
        mirror = os.environ.get("DAFT_SPARK_HF_MIRROR")
        if mirror:
            out = os.path.join(mirror, *repo.split("/"), "data")
            self._sdf.write.mode("overwrite").parquet(out)
            return
        raise NotImplementedError(
            "write_huggingface requires the 'huggingface_hub' package and "
            "outbound network (or set DAFT_SPARK_HF_MIRROR for the offline "
            "snapshot layout); write_parquet + `huggingface-cli upload` is "
            "the manual equivalent"
        )

    # --- reference agg/conveniences (dataframe.py whole-frame aggs) ---------
    def count(self, *cols) -> "DataFrame":
        """Non-null count per column (reference DataFrame.count —
        returns a one-row DataFrame, NOT a scalar; the scalar is
        count_rows())."""
        use = list(cols) or self._sdf.columns
        return DataFrame(self._sdf.agg(*[F.count(c).alias(c) for c in use]))

    def count_distinct(self, *cols) -> "DataFrame":
        use = list(cols) or self._sdf.columns
        return DataFrame(self._sdf.agg(*[F.count_distinct(F.col(c)).alias(c) for c in use]))

    def any_value(self, *cols) -> "DataFrame":
        use = list(cols) or self._sdf.columns
        return DataFrame(self._sdf.agg(*[F.any_value(c).alias(c) for c in use]))

    def product(self, *cols) -> "DataFrame":
        from daft_spark.functions.aggs import product as _product

        return (
            DataFrame(self._sdf.agg(*[_product(F.col(c)).alias(c) for c in cols]))
            if cols
            else self._agg_all(lambda c: _product(F.col(c)))
        )

    def skew(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.skewness(c).alias(c) for c in cols])) if cols else self._agg_all(F.skewness)

    def var(self, *cols) -> "DataFrame":
        return DataFrame(self._sdf.agg(*[F.variance(c).alias(c) for c in cols])) if cols else self._agg_all(F.variance)

    def agg_list(self, *cols) -> "DataFrame":
        use = list(cols) or self._sdf.columns
        return DataFrame(self._sdf.agg(*[F.collect_list(c).alias(c) for c in use]))

    list_agg = agg_list

    def agg_set(self, *cols) -> "DataFrame":
        use = list(cols) or self._sdf.columns
        return DataFrame(self._sdf.agg(*[F.collect_set(c).alias(c) for c in use]))

    list_agg_distinct = agg_set

    def agg_concat(self, *cols) -> "DataFrame":
        """Concatenate per-row arrays across all rows (reference
        agg_concat)."""
        use = list(cols) or self._sdf.columns
        return DataFrame(
            self._sdf.agg(*[F.flatten(F.collect_list(c)).alias(c) for c in use])
        )

    def string_agg(self, *cols, sep: str = "") -> "DataFrame":
        from daft_spark.functions.aggs import string_agg as _sagg

        use = list(cols) or self._sdf.columns
        return DataFrame(self._sdf.agg(*[_sagg(F.col(c), sep).alias(c) for c in use]))

    def drop_null(self, *cols) -> "DataFrame":
        """Drop rows with SQL nulls in the given (or any) columns
        (reference drop_null — NaN is NOT null; Spark's dropna would
        drop NaNs too, so this filters on isNotNull)."""
        use = list(cols) or self._sdf.columns
        out = self._sdf
        for c in use:
            out = out.filter(F.col(c).isNotNull())
        return DataFrame(out)

    def drop_nan(self, *cols) -> "DataFrame":
        """Drop rows with NaNs in the given (or all float) columns."""
        use = list(cols) or [
            f.name for f in self._sdf.schema.fields
            if f.dataType.typeName() in ("double", "float")
        ]
        out = self._sdf
        for c in use:
            out = out.filter(~F.isnan(F.col(c)) | F.col(c).isNull())
        return DataFrame(out)

    def map_groups(self, fn, schema, group_by=None) -> "DataFrame":
        """Whole-group pandas transform (reference map_groups): grouped
        applyInPandas, or a single-pass mapInPandas when ungrouped."""
        if group_by:
            cols = [group_by] if isinstance(group_by, str) else list(group_by)
            return DataFrame(self._sdf.groupBy(*cols).applyInPandas(fn, schema))
        return DataFrame(self._sdf.mapInPandas(lambda it: map(fn, it), schema))

    def into_batches(self, batch_size: int) -> "DataFrame":
        """Batch-size control for downstream Arrow/pandas UDF stages
        (reference into_batches / IntoBatches op). Spark's execution
        model sizes Python-boundary batches from
        spark.sql.execution.arrow.maxRecordsPerBatch at execution time
        (per-operator batch sizes don't exist — a re-sliced stream is
        re-chunked at the next stage boundary), so this sets the
        session conf; every subsequent batch UDF in this session sees
        batches of at most ``batch_size`` rows."""
        self._sdf.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )
        return self

    def skip_existing(self, output_path: str, key_cols: list[str],
                      output_format: str = "parquet") -> "DataFrame":
        """reference DataFrame.skip_existing (dataframe.py:3233) —
        resume filtering via anti-join (operators/checkpoint.py)."""
        from daft_spark.operators.checkpoint import skip_existing

        return DataFrame(skip_existing(self._sdf, output_path, key_cols, output_format))

    def union_all_by_name(self, other) -> "DataFrame":
        """unionByName keeping duplicates (reference
        union_all_by_name)."""
        return DataFrame(self._sdf.unionByName(_unwrap(other)))

    def num_partitions(self) -> int:
        return self._sdf.rdd.getNumPartitions()

    def metrics(self) -> dict:
        """Engine metrics snapshot (reference DataFrame.metrics)."""
        from daft_spark.runtime import metrics as _metrics

        return _metrics()

    def set_storage_option(self, key: str, value: str) -> "DataFrame":
        """Cloud-storage credential/option (reference
        set_storage_option) — lands in the session's hadoop conf, so it
        applies to this plan's scans."""
        self._sdf.sparkSession.sparkContext._jsc.hadoopConfiguration().set(key, value)
        return self

    @property
    def skipped_corrupt_files(self):
        """reference skipped_corrupt_files: Spark counts skipped files
        only when spark.sql.files.ignoreCorruptFiles is on, and exposes
        them in task metrics/logs rather than per-plan — no per-frame
        number exists, so this is None (never a fake 0)."""
        return None

    def to_arrow_iter(self):
        """Iterator of Arrow record batches (reference to_arrow_iter) —
        driver-side, batch-at-a-time."""
        yield from self._sdf.toArrow().to_batches()

    def to_dask_dataframe(self, npartitions: int | None = None):
        try:
            import dask.dataframe as dd
        except ImportError as e:
            raise ImportError("to_dask_dataframe requires the 'dask' package") from e
        return dd.from_pandas(self._sdf.toPandas(), npartitions=npartitions or 1)

    def to_ray_dataset(self):
        try:
            import ray
        except ImportError as e:
            raise ImportError("to_ray_dataset requires the 'ray' package") from e
        return ray.data.from_arrow(self._sdf.toArrow())

    def _torch(self):
        try:
            import torch  # noqa: F401
            import torch.utils.data as tud
        except ImportError as e:
            raise ImportError("to_torch_* requires the 'torch' package") from e
        return tud

    def to_torch_map_dataset(self):
        """reference to_torch_map_dataset — indexable row dataset."""
        tud = self._torch()
        rows = self.to_pylist()

        class _MapDS(tud.Dataset):
            def __len__(self):
                return len(rows)

            def __getitem__(self, i):
                return rows[i]

        return _MapDS()

    def to_torch_iter_dataset(self):
        tud = self._torch()
        arrow_iter = self.to_arrow_iter

        class _IterDS(tud.IterableDataset):
            def __iter__(self):
                for batch in arrow_iter():
                    yield from batch.to_pylist()

        return _IterDS()

    def to_torch_dataloader(self, batch_size: int = 32, **kw):
        tud = self._torch()
        return tud.DataLoader(self.to_torch_map_dataset(), batch_size=batch_size, **kw)

    # --- introspection ------------------------------------------------------
    @property
    def schema(self):
        return self._sdf.schema

    @property
    def column_names(self) -> list[str]:
        return self._sdf.columns

    @property
    def columns(self) -> list[Column]:
        """reference DataFrame.columns — the Column objects (the name
        list is column_names)."""
        return [self._sdf[c] for c in self._sdf.columns]

    def __getitem__(self, name: str) -> Column:
        return self._sdf[name]

    def __getattr__(self, name):
        # fall through to the underlying Spark DataFrame for anything we
        # haven't wrapped (escape hatch, same spirit as reference to_*)
        return getattr(self._sdf, name)

    def to_spark(self) -> SparkDataFrame:
        return self._sdf

    def __repr__(self) -> str:
        return f"daft_spark.DataFrame[{', '.join(f'{f.name}: {f.dataType.simpleString()}' for f in self._sdf.schema.fields)}]"


class GroupedDataFrame:
    """Parity: reference GroupedDataFrame (dataframe.py:6219-6495)."""

    def __init__(self, gd):
        self._gd = gd

    def agg(self, *exprs) -> DataFrame:
        return DataFrame(self._gd.agg(*exprs))

    def sum(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.sum(c).alias(c) for c in cols]))

    def mean(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.avg(c).alias(c) for c in cols]))

    def min(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.min(c).alias(c) for c in cols]))

    def max(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.max(c).alias(c) for c in cols]))

    def count(self) -> DataFrame:
        return DataFrame(self._gd.count())

    def any_value(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.any_value(c).alias(c) for c in cols]))

    def concat(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.collect_list(c).alias(c) for c in cols]))

    def stddev(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.stddev(c).alias(c) for c in cols]))

    def var(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.variance(c).alias(c) for c in cols]))

    def skew(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.skewness(c).alias(c) for c in cols]))

    def count_distinct(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.count_distinct(F.col(c)).alias(c) for c in cols]))

    def product(self, *cols) -> DataFrame:
        from daft_spark.functions.aggs import product as _product

        return DataFrame(self._gd.agg(*[_product(F.col(c)).alias(c) for c in cols]))

    def list_agg(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.collect_list(c).alias(c) for c in cols]))

    def list_agg_distinct(self, *cols) -> DataFrame:
        return DataFrame(self._gd.agg(*[F.collect_set(c).alias(c) for c in cols]))

    def string_agg(self, *cols, sep: str = "") -> DataFrame:
        from daft_spark.functions.aggs import string_agg as _sagg

        return DataFrame(self._gd.agg(*[_sagg(F.col(c), sep).alias(c) for c in cols]))

    def map_groups(self, fn, schema) -> DataFrame:
        """Full-group pandas UDF (reference map_groups dataframe.py:6495
        -> applyInPandas)."""
        return DataFrame(self._gd.applyInPandas(fn, schema))
