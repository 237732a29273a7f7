"""Datetime functions — Daft-name parity (reference:
``daft/functions/datetime.py``, ~60 fns at :13-1815). Near-1:1 Spark
names per SURVEY §2.6; nanosecond precision is the only gap (Spark is
µs) — ns inputs are truncated on read (io/readers.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def date(col):
    return F.to_date(_c(col))


def day(col):
    return F.dayofmonth(_c(col))


def hour(col):
    return F.hour(_c(col))


def minute(col):
    return F.minute(_c(col))


def second(col):
    return F.second(_c(col))


def millisecond(col):
    return (F.unix_micros(_c(col).cast("timestamp")) % 1_000_000 / 1000).cast("int")


def microsecond(col):
    return (F.unix_micros(_c(col).cast("timestamp")) % 1_000_000).cast("int")


def month(col):
    return F.month(_c(col))


def quarter(col):
    return F.quarter(_c(col))


def year(col):
    return F.year(_c(col))


def day_of_week(col):
    """Monday=0..Sunday=6 (reference datetime.py day_of_week).
    Spark dayofweek is Sunday=1..Saturday=7."""
    return (F.dayofweek(_c(col)) + 5) % 7


def day_of_month(col):
    return F.dayofmonth(_c(col))


def day_of_year(col):
    return F.dayofyear(_c(col))


def week_of_year(col):
    return F.weekofyear(_c(col))


def unix_date(col):
    return F.unix_date(F.to_date(_c(col)))


def strftime(col, fmt: str | None = None):
    return F.date_format(_c(col), fmt or "yyyy-MM-dd HH:mm:ss")


def to_date(col, fmt: str):
    return F.to_date(_c(col), fmt)


def to_datetime(col, fmt: str, timezone: str | None = None):
    ts = F.to_timestamp(_c(col), fmt)
    if timezone:
        ts = F.to_utc_timestamp(ts, timezone)
    return ts


def convert_time_zone(col, tz: str):
    return F.from_utc_timestamp(_c(col), tz)


def replace_time_zone(col, tz: str | None):
    return F.to_utc_timestamp(_c(col), tz) if tz else _c(col).cast("timestamp_ntz")


def date_trunc(unit: str, col):
    return F.date_trunc(unit, _c(col))


def total_seconds(col):
    """Duration column (DayTimeInterval) -> seconds (exact to µs:
    epoch + interval -> unix_micros recovers the interval's micros
    without interval-to-numeric cast truncation)."""
    return _total_micros(col) / 1_000_000.0


def _total_micros(col):
    return F.unix_micros(F.timestamp_seconds(F.lit(0)) + _c(col))


def to_unix_epoch(col, unit: str = "s"):
    c = _c(col).cast("timestamp")
    scale = {"s": F.unix_timestamp(c), "ms": F.unix_millis(c), "us": F.unix_micros(c),
             "ns": F.unix_micros(c) * 1000}
    return scale[unit]


def date_add(col, days: int):
    return F.date_add(_c(col), days)


def date_sub(col, days: int):
    return F.date_sub(_c(col), days)


def date_diff(end, start):
    return F.datediff(_c(end), _c(start))


def add_months(col, n: int):
    return F.add_months(_c(col), n)


def months_between(a, b):
    return F.months_between(_c(a), _c(b))


def last_day(col):
    return F.last_day(_c(col))


def next_day(col, day_of_week: str):
    return F.next_day(_c(col), day_of_week)


def from_unixtime(col):
    return F.from_unixtime(_c(col))


def timestamp_seconds(col):
    return F.timestamp_seconds(_c(col))


def timestamp_millis(col):
    return F.timestamp_millis(_c(col))


def timestamp_micros(col):
    return F.timestamp_micros(_c(col))


def make_date(y, m, d):
    return F.make_date(_c(y), _c(m), _c(d))


def make_timestamp(y, mo, d, h, mi, s):
    return F.make_timestamp(_c(y), _c(mo), _c(d), _c(h), _c(mi), _c(s))


def current_date():
    return F.current_date()


def current_timestamp():
    return F.current_timestamp()


def current_timezone():
    return F.current_timezone()


def nanosecond(col):
    """reference datetime.py nanosecond — Spark timestamps carry µs
    precision, so this is microsecond*1000 (ns ingest is widened on
    read, SURVEY §1.2)."""
    return (F.unix_micros(_c(col)) % 1_000_000 * 1000).cast("long")


def time(col):
    """reference datetime.py time — the time-of-day component. Spark
    has no TIME type; returns the 'HH:mm:ss.SSSSSS' string."""
    return F.date_format(_c(col), "HH:mm:ss.SSSSSS")


def total_days(col):
    return (total_seconds(col) / 86400).cast("long")


def total_hours(col):
    return (total_seconds(col) / 3600).cast("long")


def total_minutes(col):
    return (total_seconds(col) / 60).cast("long")


def total_milliseconds(col):
    return (_total_micros(col) / 1000).cast("long")


def total_microseconds(col):
    return _total_micros(col)


def total_nanoseconds(col):
    return _total_micros(col) * 1000
