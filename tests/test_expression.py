"""Expression algebra, string compiler, NaN/missing triple.

Mirrors the reference's expression/strings/datetime test intent
(tests/{strings,datetime}_test.py) with numpy oracles.
"""

import numpy as np
import pytest


def test_operator_overloading(base_df):
    z = (base_df.x * 2 + 1).evaluate()
    np.testing.assert_allclose(z, np.arange(-2.0, 19.0) * 2 + 1)


def test_virtual_column_and_variable(base_df):
    # z = x + t*y with t=1 (common.py:378-380)
    z = base_df.z.evaluate()
    x = np.arange(-2.0, 19.0)
    np.testing.assert_allclose(np.sort(z), np.sort(x + x ** 2))


def test_string_expression_compiler(base_df):
    v = base_df["(x + 1) ** 2"] if False else None
    import vaex_spark as vs
    e = vs.Expression(base_df, "(x + 1) ** 2")
    np.testing.assert_allclose(np.sort(e.evaluate()), np.sort((np.arange(-2.0, 19.0) + 1) ** 2))


def test_expression_functions_in_strings(base_df):
    import vaex_spark as vs
    e = vs.Expression(base_df, "where(x > 0, sqrt(abs(x)), 0.0)")
    x = np.arange(-2.0, 19.0)
    expected = np.where(x > 0, np.sqrt(np.abs(x)), 0.0)
    np.testing.assert_allclose(np.sort(e.evaluate()), np.sort(expected))


def test_chained_comparison(base_df):
    import vaex_spark as vs
    e = vs.Expression(base_df, "(0 <= x) & (x < 10)")
    assert int(e.astype("int64").sum()) == 10


def test_nan_missing_triple(base_df):
    # n has 2 NaN, m has 2 null, nm has 2 NaN + 2 null (FIXTURES F1)
    assert base_df.n.countnan() == 2
    assert base_df.n.countmissing() == 0
    assert base_df.m.countmissing() == 2
    assert base_df.m.countnan() == 0
    assert base_df.nm.countna() == 4
    assert base_df.nm.countnan() == 2
    assert base_df.nm.countmissing() == 2


def test_fillna_family(base_df):
    filled = base_df.nm.fillna(-99.0).evaluate()
    assert np.sum(filled == -99.0) == 4
    fm = base_df.nm.fillmissing(-98.0).evaluate()
    assert np.sum(fm == -98.0) == 2
    assert np.isnan(fm).sum() == 2
    fn = base_df.nm.fillnan(-97.0).evaluate()
    assert np.sum(fn == -97.0) == 2


def test_dropna_dropnan_dropmissing(base_df):
    assert base_df.nm.dropna().count() == 17
    assert base_df.nm.dropnan().count() == 19
    assert base_df.nm.dropmissing().count() == 19


def test_astype_and_clip(base_df):
    v = base_df.x.clip(0, 5).evaluate()
    np.testing.assert_allclose(np.sort(v), np.sort(np.clip(np.arange(-2.0, 19.0), 0, 5)))
    assert base_df.x.astype("int32").evaluate().dtype in (np.int32, np.int64)


def test_isin(base_df):
    assert base_df[base_df.x.isin([0.0, 1.0, 2.0])].count() == 3


def test_map(base_df):
    m = base_df.x.map({0.0: 100.0, 1.0: 200.0}, default_value=-1.0).evaluate()
    assert np.sum(m == 100.0) == 1 and np.sum(m == 200.0) == 1
    assert np.sum(m == -1.0) == 19


def test_string_accessor(base_df):
    upper = base_df.name.str.upper().evaluate()
    assert all(s == s.upper() for s in upper)
    lens = base_df.name.str.len().evaluate()
    names = base_df.name.evaluate()
    assert all(int(l) == len(s) for l, s in zip(lens, names))
    assert base_df[base_df.name.str.contains("bla", regex=False)].count() == 21
    assert base_df[base_df.name.str.startswith("1")].count() == 10  # 1.0bla + 10..18
    sliced = base_df.name.str.slice(0, 3).evaluate()
    assert all(s == n[:3] for s, n in zip(sliced, names))


def test_datetime_accessor(base_df):
    years = base_df.datetime.dt.year.evaluate()
    assert years.min() >= 1991
    dows = base_df.datetime.dt.dayofweek.evaluate()
    assert set(int(d) for d in dows) <= set(range(7))
    # pandas oracle for dayofweek (Monday=0)
    import pandas as pd
    pdf = base_df.to_pandas_df()
    expected = pd.to_datetime(pdf["datetime"]).dt.dayofweek.values
    got = base_df.datetime.dt.dayofweek.evaluate()
    np.testing.assert_array_equal(np.sort(got), np.sort(expected))


def test_int64_extremes_sum(base_df):
    # ints holds 2^62+1 and -2^62+1 (overflow-safety, FIXTURES F1)
    total = base_df.ints.sum()
    expected = (2 ** 62 + 1) + (-(2 ** 62) + 1) + sum(range(0, 19))
    assert int(total) == expected


def test_apply_udf(base_df):
    doubled = base_df.x.apply(lambda v: v * 2.0)
    np.testing.assert_allclose(np.sort(doubled.evaluate()),
                               np.sort(np.arange(-2.0, 19.0) * 2))


def test_apply_vectorized(base_df):
    import pandas as pd

    def f(s: pd.Series) -> pd.Series:
        return s + 1.0

    out = base_df.x.apply(f, vectorize=True)
    np.testing.assert_allclose(np.sort(out.evaluate()), np.sort(np.arange(-2.0, 19.0) + 1))


def test_searchsorted_numpy_parity(spark):
    import numpy as np
    import vaex_spark as vs
    bins = [0.0, 1.5, 3.0, 7.0]
    vals = [-1.0, 0.0, 1.5, 2.0, 3.0, 6.9, 7.0, 8.0]
    df = vs.from_arrays(x=vals, spark=spark)
    for side in ("left", "right"):
        df[f"idx_{side}"] = df.x.searchsorted(bins, side=side)
        got = [r[f"idx_{side}"] for r in df.spark.select(f"idx_{side}").collect()]
        want = np.searchsorted(bins, vals, side=side).tolist()
        assert got == want, (side, got, want)


def test_searchsorted_string_path_numpy_parity(spark):
    """The registry/string-expression path must agree with numpy AND
    with Expression.searchsorted (r11 ADVICE: the registry had both
    sides swapped; the x==edge rows are the discriminating inputs)."""
    import numpy as np
    import vaex_spark as vs
    bins = [10.0, 25.0, 40.0]
    vals = [5.0, 10.0, 25.0, 40.0, 41.0]
    df = vs.from_arrays(x=vals, spark=spark)
    for side in ("left", "right"):
        df[f"s_{side}"] = df[f"searchsorted([10.0, 25.0, 40.0], x, side='{side}')"]
        df[f"m_{side}"] = df.x.searchsorted(bins, side=side)
        rows = df.spark.select(f"s_{side}", f"m_{side}").collect()
        got_str = [r[f"s_{side}"] for r in rows]
        got_meth = [r[f"m_{side}"] for r in rows]
        want = np.searchsorted(bins, vals, side=side).tolist()
        assert got_str == want, (side, got_str, want)
        assert got_meth == want, (side, got_meth, want)
    import pytest
    with pytest.raises(ValueError):
        df["bad"] = df["searchsorted([1.0], x, side='middle')"]


def test_expression_conversion_parity(spark):
    import numpy as np
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, 2.0, 3.0], s=["a", "b", "c"], spark=spark)
    e = df.x * 2
    assert e.tolist() == [2.0, 4.0, 6.0]
    assert e.to_pandas_series().tolist() == [2.0, 4.0, 6.0]
    assert e.to_arrow().to_pylist() == [2.0, 4.0, 6.0]
    np.testing.assert_allclose(e.values, [2.0, 4.0, 6.0])
    assert df.s.is_string() and not df.x.is_string()
    assert e.shape == (3,) and e.ndim == 1
    assert e.data_type() == "double"
    assert e.copy().tolist() == e.tolist()
    assert e.jit_numba() is e  # Catalyst IS the JIT
    e.nop()


def test_expression_introspection(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0], y=[2.0], spark=spark)
    e = df["x + y * 2"]
    assert e.expression == "x + y * 2"
    assert e.ast_names() == ["x", "y"]
    assert e.variables() == {"x", "y"}
    assert e.dependencies() == e.variables()
    assert e.transient
    assert not df["x"].transient
    df["v"] = df["x + y"]
    assert df["v * 3"].variables() >= {"v"}
    assert e.fingerprint().startswith("expression-")
    assert e.expand() is e


def test_ufunc_completeness(spark):
    """Every function in the reference's numpy_function_mapping
    (functions.py:53-85) resolves and matches numpy."""
    import numpy as np
    import vaex_spark as vs
    x = [0.1, 0.5, 0.9]
    df = vs.from_arrays(x=x, spark=spark)
    cases = {
        "sinc(x)": np.sinc(x),
        "deg2rad(x)": np.deg2rad(x),
        "rad2deg(x)": np.rad2deg(x),
        "arccosh(x + 1)": np.arccosh(np.array(x) + 1),
        "expm1(x)": np.expm1(x),
        "maximum(x, 0.4)": np.maximum(x, 0.4),
        "minimum(x, 0.4)": np.minimum(x, 0.4),
    }
    for expr, want in cases.items():
        np.testing.assert_allclose(df[expr].tolist(), want, atol=1e-12, err_msg=expr)


def test_derivative(spark):
    import numpy as np
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, 2.0], y=[3.0, 4.0], spark=spark)
    d = df["x**2 * y + log(x)"].derivative("x")
    np.testing.assert_allclose(d.tolist(), [2 * 1 * 3 + 1, 2 * 2 * 4 + 0.5])
    d2 = (df.x * df.y + df.x ** 3).derivative(df.x)
    np.testing.assert_allclose(d2.tolist(), [3 + 3, 4 + 12])
    d3 = df["sin(x)"].derivative("x")
    np.testing.assert_allclose(d3.tolist(), np.cos([1.0, 2.0]))


def test_propagate_uncertainties(spark):
    """Reference docstring example (dataframe.py:3650): u = x + y with
    independent errors -> u_uncertainty = sqrt(e_x^2 + e_y^2)."""
    import numpy as np
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0], y=[2.0], e_x=[0.1], e_y=[0.2], spark=spark)
    df["u"] = df.x + df.y
    df["v"] = df["log10(x + 1)"]
    df.propagate_uncertainties([df["u"], df["v"]])
    np.testing.assert_allclose(df["u_uncertainty"].tolist(),
                               [np.sqrt(0.1 ** 2 + 0.2 ** 2)])
    # d(log10(x+1))/dx = 1/((x+1) ln 10)
    np.testing.assert_allclose(df["v_uncertainty"].tolist(),
                               [0.1 / (2 * np.log(10))])
    # correlated pair via correlation column
    df2 = vs.from_arrays(a=[1.0], b=[2.0], e_a=[0.1], e_b=[0.2],
                         a_b_correlation=[0.5], spark=spark)
    df2["s"] = df2.a + df2.b
    df2.propagate_uncertainties([df2["s"]])
    want = np.sqrt(0.1 ** 2 + 0.2 ** 2 + 2 * 0.5 * 0.1 * 0.2)
    np.testing.assert_allclose(df2["s_uncertainty"].tolist(), [want])


def test_struct_accessor_introspection(spark):
    import vaex_spark as vs
    from pyspark.sql import functions as F
    df = vs.from_arrays(a=[1], b=["x"], spark=spark)
    df["s"] = vs.Expression(df, F.struct(F.col("a"), F.col("b")))
    st = df.s.struct
    assert st.keys() == ["a", "b"]
    d = st.dtypes()
    assert list(d.index) == ["a", "b"] and d["b"] == "string"
    assert [n for n, _ in st.items()] == ["a", "b"]
    assert len(st.values()) == 2
    assert st.values()[0].evaluate().tolist() == [1]


def test_json_accessor(spark):
    import vaex_spark as vs
    df = vs.from_arrays(j=['{"a": 1, "b": [1,2,3]}', "not json", None], spark=spark)
    assert df.j.js.get("a").evaluate().tolist()[0] == "1"
    assert df.j.js["a"].astype("long").evaluate().tolist()[0] == 1
    assert df.j.js.array_length("b").evaluate().tolist()[0] == 3
    valid = df.j.js.is_valid().evaluate().tolist()
    assert valid[0] is True and valid[1] is False
    parsed = df.j.js.parse("a int, b array<int>")
    assert list(parsed.evaluate().tolist()[0]["b"]) == [1, 2, 3]
    keys = df.j.js.keys().evaluate().tolist()[0]
    assert sorted(keys) == ["a", "b"]


def test_astype_datetime64_numpy_unit_semantics(spark):
    """numpy reads a numeric→datetime64[unit] astype as UNITS SINCE
    EPOCH (the reference is plain arr.astype(dtype)); Spark's
    cast(bigint AS TIMESTAMP) reads SECONDS — r14 made both astype
    spellings unit-aware (year-294247 timestamps before, caught by the
    temporal_rolling probe fixture)."""
    import pandas as pd

    import vaex_spark as vs
    mu = np.array([0, 1_577_836_800_000_000, 86_400_000_000])
    df = vs.from_arrays(spark=spark, i=np.arange(3), us=mu,
                        s=mu // 1_000_000, ns=mu * 1000,
                        d=(mu // 86_400_000_000).astype("int64"),
                        txt=np.array(["2020-01-01", "2021-06-02 03:04:05",
                                      "1970-01-01"]))

    def us_of(col):
        return list(pd.to_datetime(df.to_pandas_df([col])[col])
                    .astype("int64") // 1000)

    # method path, three units
    for src, unit in [("us", "us"), ("s", "s"), ("ns", "ns")]:
        df["o"] = df[src].astype(f"datetime64[{unit}]")
        assert us_of("o") == list(mu), (src, unit)
    # expression-string path, both spellings
    df["o2"] = "astype(us, 'datetime64[us]')"
    df["o3"] = "us.astype('datetime64[us]')"
    assert us_of("o2") == list(mu) and us_of("o3") == list(mu)
    # [D] from int day counts -> DATE
    df["o4"] = df.d.astype("datetime64[D]")
    assert [str(v) for v in df.to_pandas_df(["o4"])["o4"]] == \
        ["1970-01-01", "2020-01-01", "1970-01-02"]
    # non-numeric sources keep Spark cast: string parse, ts->date trunc
    df["o5"] = df.txt.astype("datetime64[us]")
    assert str(pd.to_datetime(df.to_pandas_df(["o5"])["o5"]).iloc[1]) == \
        "2021-06-02 03:04:05"
    ts = pd.date_range("2024-05-01 13:00", periods=3, freq="h").to_numpy()
    dft = vs.from_arrays(spark=spark, t=ts)
    dft["od"] = dft.t.astype("datetime64[D]")
    assert str(dft.to_pandas_df(["od"])["od"].iloc[0]) == "2024-05-01"
    # arithmetic input through the string compiler (the probe spelling)
    df["o6"] = "astype(d * 86400000000, 'datetime64[us]')"
    assert us_of("o6") == [0, 1_577_836_800_000_000, 86_400_000_000]
