"""List/array functions — Daft-name parity (reference:
``daft/functions/list.py``, 618 LoC, :11-586 +
``src/daft-functions-list/``). Mostly built-in array functions;
value_counts/chunk/list_mean are higher-order compositions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def list_join(col, delimiter: str = ","):
    return F.array_join(_c(col), delimiter)


def flatten(col):
    return F.flatten(_c(col))


def count_(col):
    return F.size(_c(col))


def list_sum(col):
    return F.aggregate(_c(col), F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def list_mean(col):
    c = _c(col)
    valid = F.filter(c, lambda x: x.isNotNull())
    return F.when(
        F.size(valid) > 0,
        F.aggregate(valid, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        / F.size(valid),
    )


def list_min(col):
    return F.array_min(_c(col))


def list_max(col):
    return F.array_max(_c(col))


def list_bool_and(col):
    return F.forall(_c(col), lambda x: x)


def list_bool_or(col):
    return F.exists(_c(col), lambda x: x)


def sort_(col, desc: bool = False):
    c = F.array_sort(_c(col))
    return F.reverse(c) if desc else c


def distinct(col):
    return F.array_distinct(_c(col))


def map_(col, fn):
    return F.transform(_c(col), fn)


def filter_(col, fn):
    return F.filter(_c(col), fn)


def explode(col):
    return F.explode(_c(col))


def append(col, value):
    return F.array_append(_c(col), value)


def contains(col, value):
    return F.array_contains(_c(col), value)


def seq(start, stop, step=None):
    if step is None:
        return F.sequence(_c(start), _c(stop))
    return F.sequence(_c(start), _c(stop), _c(step))


def slice_(col, start: int, length: int):
    """0-based slice (reference list.py slice); Spark slice is 1-based."""
    return F.slice(_c(col), start + 1, length)


def get(col, idx: int, default=None):
    """0-based element access, null/default when out of bounds."""
    out = F.get(_c(col), idx)
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return out


def value_counts(col):
    """Map of element -> count (reference list.py value_counts) via
    aggregate into a map."""
    c = _c(col)
    return F.aggregate(
        c,
        F.create_map().cast("map<string,int>"),
        lambda acc, x: F.map_concat(
            F.map_filter(acc, lambda k, v: k != x.cast("string")),
            F.create_map(
                x.cast("string"),
                F.coalesce(F.element_at(acc, x.cast("string")), F.lit(0)) + 1,
            ),
        ),
    )


def chunk(col, size: int):
    """Split a list into fixed-size chunks (reference list.py chunk)."""
    c = _c(col)
    n_chunks = F.ceil(F.size(c) / F.lit(size)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(c, i * size + 1, size),
    )
