"""Datetime / timedelta accessors (reference: vaex-core/vaex/functions.py:
302-809 dt scope, :810-962 td scope).

Semantic adaptations (SURVEY §2.8 table):

* vaex ``dt.dayofweek`` follows pandas: Monday=0..Sunday=6.  Spark's
  ``dayofweek`` is Sunday=1..Saturday=7 — adapted via ``(d + 5) % 7``.
* ``dt.weekofyear`` / ``weekday`` use ISO weeks on both sides (Spark
  ``weekofyear`` is ISO) — no adaptation.
* ``dt.floor('d'|'h'|...)`` maps to ``date_trunc``.
* timedelta accessors operate on DayTimeIntervalType or on raw
  second-differences; total_seconds goes through cast to double seconds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import register_function, _c

_MONTH_NAMES = "January February March April May June July August September October November December".split()
_DAY_NAMES = "Monday Tuesday Wednesday Thursday Friday Saturday Sunday".split()

_TRUNC_UNITS = {
    "Y": "year", "M": "month", "W": "week", "D": "day", "d": "day",
    "h": "hour", "H": "hour", "m": "minute", "T": "minute",
    "s": "second", "S": "second",
}


def dt_dayofweek(c: Column) -> Column:
    return (F.dayofweek(c) + 5) % 7


def dt_month_name(c: Column) -> Column:
    return F.date_format(c, "MMMM")


def dt_day_name(c: Column) -> Column:
    return F.date_format(c, "EEEE")


def dt_halfyear(c: Column) -> Column:
    return F.when(F.quarter(c) <= 2, 1).otherwise(2)


def dt_floor(c: Column, freq: str) -> Column:
    unit = _TRUNC_UNITS.get(freq, freq.lower())
    return F.date_trunc(unit, c)


class DateTimeAccessor:
    """``expr.dt.*`` — properties in vaex; methods+properties here."""

    def __init__(self, expr):
        self.expr = expr

    def _w(self, col):
        return type(self.expr)(self.expr.df, col)

    @property
    def date(self): return self._w(F.to_date(self.expr.col))
    @property
    def year(self): return self._w(F.year(self.expr.col))
    @property
    def month(self): return self._w(F.month(self.expr.col))
    @property
    def day(self): return self._w(F.dayofmonth(self.expr.col))
    @property
    def hour(self): return self._w(F.hour(self.expr.col))
    @property
    def minute(self): return self._w(F.minute(self.expr.col))
    @property
    def second(self): return self._w(F.second(self.expr.col))
    @property
    def quarter(self): return self._w(F.quarter(self.expr.col))
    @property
    def halfyear(self): return self._w(dt_halfyear(self.expr.col))
    @property
    def dayofweek(self): return self._w(dt_dayofweek(self.expr.col))
    @property
    def dayofyear(self): return self._w(F.dayofyear(self.expr.col))
    @property
    def weekofyear(self): return self._w(F.weekofyear(self.expr.col))
    @property
    def month_name(self): return self._w(dt_month_name(self.expr.col))
    @property
    def day_name(self): return self._w(dt_day_name(self.expr.col))

    @property
    def is_leap_year(self):
        y = F.year(self.expr.col)
        return self._w(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0))

    def strftime(self, fmt):
        # translate common strftime directives -> Java SimpleDateFormat
        java = (fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
                   .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
                   .replace("%y", "yy").replace("%j", "DDD"))
        return self._w(F.date_format(self.expr.col, java))

    def floor(self, freq):
        return self._w(dt_floor(self.expr.col, freq))


class TimeDeltaAccessor:
    """``expr.td.*`` (functions.py:810-962).  Operates on day-time
    intervals; everything derives from total seconds."""

    def __init__(self, expr):
        self.expr = expr

    def _w(self, col):
        return type(self.expr)(self.expr.df, col)

    def _total_seconds_col(self) -> Column:
        c = self.expr.col
        # DayTimeIntervalType casts to double seconds via bigint micros
        return c.cast("interval day to second").cast("bigint") / F.lit(1.0)

    @property
    def days(self):
        return self._w(F.floor(self._total_seconds_col() / 86400).cast("long"))

    @property
    def seconds(self):
        # pandas: seconds within the day component
        total = self._total_seconds_col()
        return self._w((total - F.floor(total / 86400) * 86400).cast("long"))

    @property
    def microseconds(self):
        """pandas .microseconds component: the sub-second part in
        microseconds (0..999999).  Interval cast to bigint truncates to
        whole seconds; EXTRACT(SECOND) keeps the fraction as
        DECIMAL(8,6) — the difference times 1e6 is the component."""
        c = self.expr.col.cast("interval day to second")
        sec = F.date_part(F.lit("SECOND"), c)
        return self._w(((sec % 1) * 1000000).cast("long"))

    @property
    def nanoseconds(self):
        return self._w(F.lit(0).cast("long"))

    def total_seconds(self):
        return self._w(self._total_seconds_col().cast("double"))


# flat names for expression strings: dt_year(x), td_total_seconds(x) ...
_DT_FLAT = {
    "date": lambda x: F.to_date(_c(x)),
    "year": lambda x: F.year(_c(x)),
    "month": lambda x: F.month(_c(x)),
    "day": lambda x: F.dayofmonth(_c(x)),
    "hour": lambda x: F.hour(_c(x)),
    "minute": lambda x: F.minute(_c(x)),
    "second": lambda x: F.second(_c(x)),
    "quarter": lambda x: F.quarter(_c(x)),
    "halfyear": lambda x: dt_halfyear(_c(x)),
    "dayofweek": lambda x: dt_dayofweek(_c(x)),
    "dayofyear": lambda x: F.dayofyear(_c(x)),
    "weekofyear": lambda x: F.weekofyear(_c(x)),
    "month_name": lambda x: dt_month_name(_c(x)),
    "day_name": lambda x: dt_day_name(_c(x)),
    "floor": lambda x, freq: dt_floor(_c(x), freq),
}
for _n, _f in _DT_FLAT.items():
    register_function(scope="dt", name=_n)(_f)

register_function(scope="td", name="total_seconds")(
    lambda x: _c(x).cast("interval day to second").cast("bigint").cast("double"))
