"""Shared µs↔interval conversion for the temporal stat contract.

One implementation (r14) because the naive form is subtly wrong in a
way only extreme values reveal: ``make_dt_interval(0,0,0, us/1e6)``
needs seconds in decimal(18,6) — max ~1e12 s — while the day-time
interval (== numpy timedelta64[us]) range runs to ±9.22e12 s, so the
top decade of VALID timedeltas would cast-overflow: null non-ANSI,
error ANSI-on — exactly the ANSI-divergence class the combined oracle
battery hunts.  The days+seconds decomposition below is exact over the
full range: ``total = days*86400s + rem`` holds exactly even when the
rounded decimal division mis-floors ``days`` by one (the remainder
term absorbs it), and |rem| ≤ 86400 s always fits decimal(18,6) at
full µs precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000


def us_to_interval(us: Column) -> Column:
    """Exact µs (any numeric/decimal Column) → day-time interval.

    Values outside the ±int64-µs interval range return null under BOTH
    ANSI modes (range guard, not cast overflow)."""
    d = F.round(us).cast("decimal(38,0)")
    lim = F.lit(9223372036854775807).cast("decimal(38,0)")
    days = F.floor(d / F.lit(_US_PER_DAY)).cast("int")
    rem = d - days.cast("decimal(38,0)") * F.lit(_US_PER_DAY)
    secs = (rem / F.lit(1_000_000)).cast("decimal(18,6)")
    return F.when(F.abs(d) <= lim,
                  F.make_dt_interval(days, F.lit(0), F.lit(0), secs))


def interval_to_us(iv: Column) -> Column:
    """Day-time interval → exact µs bigint.  No direct cast exists
    (``CAST(iv AS BIGINT)`` reads the END-FIELD unit — seconds,
    truncated); anchoring at the epoch and reading back with
    ``unix_micros`` is exact µs arithmetic over the full range."""
    return F.unix_micros(F.timestamp_micros(F.lit(0)) + iv)
