"""Numeric/math functions — Daft-name parity (reference:
``daft/functions/numeric.py``, 450 LoC, :10-422). All Spark built-ins
except csc/sec/cot (reciprocal identities) and fill_nan (nanvl).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


abs_ = lambda c: F.abs(_c(c))  # noqa: E731
ceil = lambda c: F.ceil(_c(c))  # noqa: E731
floor = lambda c: F.floor(_c(c))  # noqa: E731
sign = lambda c: F.signum(_c(c))  # noqa: E731
negate = lambda c: -_c(c)  # noqa: E731
sqrt = lambda c: F.sqrt(_c(c))  # noqa: E731
cbrt = lambda c: F.cbrt(_c(c))  # noqa: E731
exp = lambda c: F.exp(_c(c))  # noqa: E731
expm1 = lambda c: F.expm1(_c(c))  # noqa: E731
ln = lambda c: F.log(_c(c))  # noqa: E731
log2 = lambda c: F.log2(_c(c))  # noqa: E731
log10 = lambda c: F.log10(_c(c))  # noqa: E731
log1p = lambda c: F.log1p(_c(c))  # noqa: E731
sin = lambda c: F.sin(_c(c))  # noqa: E731
cos = lambda c: F.cos(_c(c))  # noqa: E731
tan = lambda c: F.tan(_c(c))  # noqa: E731
asin = lambda c: F.asin(_c(c))  # noqa: E731
acos = lambda c: F.acos(_c(c))  # noqa: E731
atan = lambda c: F.atan(_c(c))  # noqa: E731
sinh = lambda c: F.sinh(_c(c))  # noqa: E731
cosh = lambda c: F.cosh(_c(c))  # noqa: E731
tanh = lambda c: F.tanh(_c(c))  # noqa: E731
radians = lambda c: F.radians(_c(c))  # noqa: E731
degrees = lambda c: F.degrees(_c(c))  # noqa: E731
factorial = lambda c: F.factorial(_c(c))  # noqa: E731


def csc(col):
    return 1.0 / F.sin(_c(col))


def sec(col):
    return 1.0 / F.cos(_c(col))


def cot(col):
    return 1.0 / F.tan(_c(col))


def log(col, base: float):
    return F.log(base, _c(col))


def round_(col, decimals: int = 0):
    return F.round(_c(col), decimals)


def clip(col, lo=None, hi=None):
    c = _c(col)
    if lo is not None:
        c = F.greatest(c, F.lit(lo))
    if hi is not None:
        c = F.least(c, F.lit(hi))
    return c


def pow_(col, p):
    return F.pow(_c(col), p)


def pmod(a, b):
    return F.pmod(_c(a), _c(b) if not isinstance(b, int) else F.lit(b))


def hypot(a, b):
    return F.hypot(_c(a), _c(b))


def atan2(y, x):
    return F.atan2(_c(y), _c(x))


def between(col, lo, hi):
    return _c(col).between(lo, hi)


def bin_(col):
    return F.bin(_c(col))


def conv(col, from_base: int, to_base: int):
    return F.conv(_c(col), from_base, to_base)


def try_divide(a, b):
    return F.try_divide(_c(a), _c(b))


def is_nan(col):
    return F.isnan(_c(col))


def not_nan(col):
    return ~F.isnan(_c(col))


def is_inf(col):
    c = _c(col)
    return (c == float("inf")) | (c == float("-inf"))


def fill_nan(col, value):
    return F.nanvl(_c(col), F.lit(value) if not isinstance(value, Column) else value)


def pi():
    return F.lit(3.141592653589793)


def e():
    return F.lit(2.718281828459045)
