"""Pandas-oracle parity sweeps, the SURVEY §5 strings_test.py model:
every str/dt accessor method runs against pandas' implementation on a
corner-case corpus.  This is the net that catches silently-swapped
arguments and off-by-one slicing."""

import numpy as np
import pandas as pd
import pytest


STRINGS = ["vaex", " Vaex ", "VAEX", "", "a b  c", "123", "x" * 10,
           "MiXeD", "tab\there", "Space Cadet", "ça-va", "__dunder__"]


@pytest.fixture(scope="module")
def sdf(spark):
    import vaex_spark as vs
    return vs.from_arrays(s=STRINGS, spark=spark)


def _got(df, expr):
    return expr.tolist()


def _eq(got, want):
    for g, w in zip(got, want):
        if w is None or (isinstance(w, float) and pd.isna(w)):
            assert g is None or (isinstance(g, float) and pd.isna(g)), (got, want)
        else:
            assert g == w, (got, want)


PS = pd.Series(STRINGS)

STR_CASES = [
    ("capitalize", lambda e: e.str.capitalize(), PS.str.capitalize()),
    ("lower", lambda e: e.str.lower(), PS.str.lower()),
    ("upper", lambda e: e.str.upper(), PS.str.upper()),
    ("len", lambda e: e.str.len(), PS.str.len()),
    ("strip", lambda e: e.str.strip(), PS.str.strip()),
    ("lstrip", lambda e: e.str.lstrip(), PS.str.lstrip()),
    ("rstrip", lambda e: e.str.rstrip(), PS.str.rstrip()),
    ("strip_chars", lambda e: e.str.strip("x_"), PS.str.strip("x_")),
    ("lstrip_chars", lambda e: e.str.lstrip("x_ "), PS.str.lstrip("x_ ")),
    ("rstrip_chars", lambda e: e.str.rstrip("x_ "), PS.str.rstrip("x_ ")),
    ("zfill", lambda e: e.str.zfill(6), PS.str.zfill(6)),
    ("ljust", lambda e: e.str.ljust(8, "."), PS.str.ljust(8, ".")),
    ("rjust", lambda e: e.str.rjust(8, "."), PS.str.rjust(8, ".")),
    ("center", lambda e: e.str.center(8, "."), PS.str.center(8, ".")),
    ("startswith", lambda e: e.str.startswith("v"), PS.str.startswith("v")),
    ("endswith", lambda e: e.str.endswith("x"), PS.str.endswith("x")),
    ("contains", lambda e: e.str.contains("ae", regex=False), PS.str.contains("ae", regex=False)),
    ("contains_re", lambda e: e.str.contains("[0-9]+", regex=True), PS.str.contains("[0-9]+", regex=True)),
    ("find", lambda e: e.str.find("a"), PS.str.find("a")),
    ("rfind", lambda e: e.str.rfind("a"), PS.str.rfind("a")),
    ("slice", lambda e: e.str.slice(1, 4), PS.str.slice(1, 4)),
    ("get", lambda e: e.str.get(0), PS.str.get(0).fillna("")),
    ("repeat", lambda e: e.str.repeat(2), PS.str.repeat(2)),
    ("replace", lambda e: e.str.replace("a", "@"), PS.str.replace("a", "@", regex=False)),
    ("replace_re", lambda e: e.str.replace(r"\s+", "_", regex=True), PS.str.replace(r"\s+", "_", regex=True)),
    ("title", lambda e: e.str.title(), PS.str.title()),
    ("isdigit", lambda e: e.str.isdigit(), PS.str.isdigit()),
    ("isalpha", lambda e: e.str.isalpha(), [s.isalpha() and s.isascii() for s in STRINGS]),
    ("isupper", lambda e: e.str.isupper(), PS.str.isupper()),
    ("islower", lambda e: e.str.islower(), PS.str.islower()),
]


@pytest.mark.parametrize("name,fn,want", STR_CASES, ids=[c[0] for c in STR_CASES])
def test_str_pandas_parity(sdf, name, fn, want):
    got = fn(sdf.s).tolist()
    want_list = list(want) if not isinstance(want, list) else want
    _eq(got, want_list)


DATES = pd.to_datetime([
    "1995-01-31 08:30:15", "2000-02-29 23:59:59", "2012-12-21 00:00:00",
    "2024-07-04 12:00:00", "1970-01-01 00:00:01"])
PD = pd.Series(DATES)


@pytest.fixture(scope="module")
def ddf(spark):
    import vaex_spark as vs
    return vs.from_arrays(t=DATES, spark=spark)


DT_CASES = [
    ("year", lambda e: e.dt.year, PD.dt.year),
    ("month", lambda e: e.dt.month, PD.dt.month),
    ("day", lambda e: e.dt.day, PD.dt.day),
    ("hour", lambda e: e.dt.hour, PD.dt.hour),
    ("minute", lambda e: e.dt.minute, PD.dt.minute),
    ("second", lambda e: e.dt.second, PD.dt.second),
    ("dayofweek", lambda e: e.dt.dayofweek, PD.dt.dayofweek),
    ("dayofyear", lambda e: e.dt.dayofyear, PD.dt.dayofyear),
    ("quarter", lambda e: e.dt.quarter, PD.dt.quarter),
    ("is_leap_year", lambda e: e.dt.is_leap_year, PD.dt.is_leap_year),
    ("weekofyear", lambda e: e.dt.weekofyear, PD.dt.isocalendar().week.astype("int64")),
]


@pytest.mark.parametrize("name,fn,want", DT_CASES, ids=[c[0] for c in DT_CASES])
def test_dt_pandas_parity(ddf, name, fn, want):
    got = fn(ddf.t).tolist()
    _eq(got, list(want))
