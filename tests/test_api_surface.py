"""API-parity batch: selection geometry, current-row bookkeeping, type
predicates, conversion/metadata shims (reference dataframe.py lines in
each docstring)."""

import numpy as np
import pytest


@pytest.fixture()
def xy(spark):
    import vaex_spark as vs
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = np.array([0.0, 1.0, 0.5, 3.0, 0.1])
    return vs.from_arrays(x=x, y=y, name=["a", "b", "c", "d", "e"], spark=spark)


def test_select_rectangle_and_box(xy):
    xy.select_rectangle("x", "y", [[0.5, 3.5], [0.0, 1.5]])
    assert xy.selected_length() == 2  # (1,1), (2,0.5)
    xy.select_box(["x"], [[0, 2.5]])
    assert xy.selected_length() == 3


def test_select_circle_and_ellipse(xy):
    xy.select_circle("x", "y", 1.0, 1.0, 1.1)
    got = xy.selected_length()
    # exact membership check
    import math
    inside = sum(1 for a, b in [(0, 0), (1, 1), (2, 0.5), (3, 3), (4, 0.1)]
                 if (a - 1) ** 2 + (b - 1) ** 2 <= 1.1 ** 2)
    assert got == inside
    xy.select_ellipse("x", "y", 2.0, 1.0, 4.0, 1.0, angle=0)
    want = 0
    for a, b in [(0, 0), (1, 1), (2, 0.5), (3, 3), (4, 0.1)]:
        xr, yr = 2.0, 0.5
        r = max(xr, yr)
        aa, bb = xr / r, yr / r
        q = ((a - 2.0)) ** 2 / aa ** 2 + ((b - 1.0)) ** 2 / bb ** 2
        want += q <= r ** 2
    assert xy.selected_length() == want


def test_select_lasso_and_non_missing(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[0.5, 2.0, 0.2], y=[0.5, 2.0, 0.8], spark=spark)
    df.select_lasso("x", "y", [0, 1, 1, 0], [0, 0, 1, 1])
    assert df.selected_length() == 2
    df2 = vs.from_arrays(a=[1.0, None, 3.0], b=[1.0, 2.0, float("nan")], spark=spark)
    df2.select_non_missing()
    assert df2.selected_length() == 1
    df2.select_non_missing(drop_nan=False)
    assert df2.selected_length() == 2
    assert df2.selection_can_undo()
    df2.selection_undo()
    assert df2.selected_length() == 1
    assert df2.selection_can_redo()


def test_current_row_and_predicates(xy):
    assert not xy.has_current_row()
    xy.set_current_row(2)
    assert xy.get_current_row() == 2 and xy.has_current_row()
    with pytest.raises(IndexError):
        xy.set_current_row(99)
    assert xy.is_string("name")
    assert not xy.is_string("x")
    assert not xy.is_datetime("x")
    assert xy.is_local()


def test_values_and_array(xy):
    vals = xy[["x", "y"]].values
    assert vals.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(vals[:, 0], dtype=float),
                               [0, 1, 2, 3, 4])
    arr = np.array(xy[["x", "y"]])
    assert arr.shape == (5, 2)


def test_validate_expression(xy):
    assert xy.validate_expression("x + y") == "x + y"
    with pytest.raises(Exception):
        xy.validate_expression("no_such_col * 2")


def test_add_column_and_variables(xy):
    xy.add_column("z", [10, 20, 30, 40, 50])
    got = sorted(r.z for r in xy.spark.select("z").collect())
    assert got == [10, 20, 30, 40, 50]
    # positional: z must line up with x
    pairs = {r.x: r.z for r in xy.spark.select("x", "z").collect()}
    assert pairs == {0.0: 10, 1.0: 20, 2.0: 30, 3.0: 40, 4.0: 50}
    xy.add_variable("k", 42)
    assert xy.variables["k"] == 42
    assert "k" in xy.get_names()
    xy.delete_variable("k")
    assert "k" not in xy.variables
    xy["v2"] = xy.x * 2
    xy.delete_virtual_column("v2")
    assert "v2" not in xy.get_column_names()


def test_byte_size_and_misc(xy):
    n = xy.byte_size()
    assert n >= 5 * (8 + 8)  # two doubles + string content
    assert xy.nbytes == n
    assert xy.as_arrow() is xy and xy.as_numpy() is xy
    xy.close()
    xy.nop("x + y")
    assert xy.shallow_copy().get_column_names() == xy.get_column_names()
    assert xy.to_copy(["x"]).get_column_names() == ["x"]
    assert xy.length() == 5 == xy.active_length()


def test_compare(spark):
    import vaex_spark as vs
    a = vs.from_arrays(x=[1, 2], y=[3.0, 4.0], spark=spark)
    b = vs.from_arrays(x=[1, 2], z=[5, 6], spark=spark)
    missing, extra, different, meta = a.compare(b)
    assert missing == ["z"] and extra == ["y"] and different == []
    c = vs.from_arrays(x=[1, 99], y=[3.0, 4.0], spark=spark)
    _, _, different, _ = a.compare(c)
    assert different == ["x"]


def test_ordinal_encode_alias(spark):
    import vaex_spark as vs
    df = vs.from_arrays(s=["b", "a", "b"], spark=spark)
    out = df.ordinal_encode("s")
    assert out.is_category("s") and out.iscategory("s")


def test_export_csv_variants(tmp_path, spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1, 2], y=["a", "b"], spark=spark)
    p1 = str(tmp_path / "a.csv")
    p2 = str(tmp_path / "b.csv")
    df.export_csv_arrow(p1)
    df.export_csv_pandas(p2)
    import pandas as pd
    assert pd.read_csv(p1)["x"].tolist() == [1, 2]
    assert pd.read_csv(p2)["y"].tolist() == ["a", "b"]


def test_top_level_parity(spark, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import vaex_spark as vs
    # read_csv alias
    p = tmp_path / "t.csv"
    pd.DataFrame({"x": [1, 2]}).to_csv(p, index=False)
    assert len(vs.read_csv(str(p), spark=spark)) == 2
    # dtype helpers
    df = vs.from_arrays(x=[1.0], spark=spark)
    assert vs.dtype_of(df.x) == "double"
    assert vs.dtype(np.int32) == "int"
    # from_dataset round trips
    assert vs.from_dataset(df) is df
    assert len(vs.from_dataset(df.spark)) == 1
    assert len(vs.from_dataset(pa.table({"a": [1, 2, 3]}), spark=spark)) == 3
    # from_arrow_dataset over parquet files keeps the native reader
    try:
        import pyarrow.dataset as pads
    except ImportError:
        pads = None
    if pads is not None:
        ds = pads.dataset("/root/testdata/sf0.001/region.parquet")
        assert len(vs.from_arrow_dataset(ds, spark=spark)) == 5
    # accessor registration
    @vs.register_dataframe_accessor("myacc", override=True)
    class MyAcc:
        def __init__(self, df):
            self.df = df

        def ncols(self):
            return len(self.df.get_column_names())

    assert df.myacc.ncols() == 1
    vs.set_log_level_warning()


def test_info_echo_print(xy, capsys):
    text = xy.info()
    assert "x: double" in text and "5 rows" in text
    assert xy.echo(42) == 42
    xy["v"] = xy.x + 1
    assert "(virtual)" in xy.info(description=False)
    xy.head_and_tail_print(2)
    out = capsys.readouterr().out
    assert "..." in out


def test_active_range_getters(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=list(range(10)), spark=spark)
    assert df.get_active_range() == (0, 10)
    assert df.get_active_fraction() == 1.0
    df.set_active_range(2, 7)
    assert df.get_active_range() == (2, 7)
    assert len(df) == 5
    df2 = vs.from_arrays(x=list(range(10)), spark=spark)
    df2.set_active_fraction(0.5)
    assert df2.get_active_fraction() == 0.5
    assert len(df2) == 5


def test_selection_favorites(spark, tmp_path, monkeypatch):
    import vaex_spark as vs
    monkeypatch.setenv("VAEX_SPARK_HOME", str(tmp_path))
    df = vs.from_arrays(x=[1.0, 2.0, 3.0, 4.0], spark=spark)
    df.select(df.x > 2)
    df.selection_favorite_add("big")
    df.select_nothing()
    assert df.selected_length() == 4
    df.selection_favorite_apply("big")
    assert df.selected_length() == 2
    assert "big" in df.selections_favorite_load()
    df.selection_favorite_remove("big")
    assert "big" not in df.selections_favorite_load()


def test_first_last_aggregates(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[3.0, 1.0, 2.0], t=[30, 10, 20], spark=spark)
    assert df.first("x", order_expression="t") == 1.0
    assert df.last("x", order_expression="t") == 3.0
    rows = df.first(2)       # int arg keeps the row-taking shorthand
    assert len(rows) == 2


def test_bins_geometry(spark):
    import numpy as np
    import vaex_spark as vs
    df = vs.from_arrays(x=[0.0], spark=spark)
    edges = df.bin_edges("x", [0, 10], shape=5)
    assert np.allclose(edges, [0, 2, 4, 6, 8, 10])
    centers = df.bin_centers("x", [0, 10], shape=5)
    assert np.allclose(centers, [1, 3, 5, 7, 9])
    assert df.nearest_bin(6.9, [0, 10], 5) == 3


def test_filtered_and_combinations(spark):
    import vaex_spark as vs
    df = vs.from_arrays(a=[1, 2], b=[3, 4], c=[5, 6], spark=spark)
    assert df.filtered is False
    out = df[df.a > 1]
    assert out.filtered is True
    combos = df.combinations(dimension=2)
    assert ("a", "b") in combos and len(combos) == 3
    combos = df.combinations(dimension=2, exclude=["c"])
    assert combos == [("a", "b")]


def test_variables_and_metadata(spark, tmp_path, monkeypatch):
    import vaex_spark as vs
    monkeypatch.setenv("VAEX_SPARK_HOME", str(tmp_path))
    df = vs.from_arrays(x=[1.0, 2.0], spark=spark)
    df.set_variable("k", "sqrt(4.0)")
    assert df.evaluate_variable("k") == 2.0
    df.units["x"] = "km/s"
    df.ucds["x"] = "phys.veloc"
    df.descriptions["x"] = "speed"
    assert df.unit("x") == "km/s"
    assert df.ucd_find("^phys.veloc") == "x"
    assert df.label("x") == "x (km/s)"
    # persistence keys on DATA identity (base plan), so cross-instance
    # roundtrip needs a file-backed frame (in-memory relations are unique)
    p = str(tmp_path / "meta_t.parquet")
    df.export_parquet(p)
    dfa = vs.open(p, spark=spark)
    dfa.units["x"] = "km/s"
    dfa.write_meta()
    df2 = vs.open(p, spark=spark)
    df2.update_meta()
    assert df2.unit("x") == "km/s"
    df3 = vs.from_arrays(x=[9.0], y=[1.0], spark=spark)
    df3.copy_metadata(df)
    assert df3.unit("x") == "km/s" and df3.unit("y") is None


def test_virtual_meta_roundtrip(spark, tmp_path, monkeypatch):
    import vaex_spark as vs
    monkeypatch.setenv("VAEX_SPARK_HOME", str(tmp_path))
    p = str(tmp_path / "vmeta_t.parquet")
    vs.from_arrays(x=[1.0, 2.0], spark=spark).export_parquet(p)
    df = vs.open(p, spark=spark)
    df["y"] = df.x * 2
    df.write_virtual_meta()
    df2 = vs.open(p, spark=spark)
    df2.update_virtual_meta()
    # multi-file parquet scan order is undefined -> compare as sets
    assert sorted(df2.evaluate("y").tolist()) == [2.0, 4.0]
    df2.remove_virtual_meta()


def test_data_namespace_and_hashed(spark):
    import vaex_spark as vs
    df = vs.from_arrays(x=[1, 2, 3], spark=spark)
    assert df.data.x.tolist() == [1, 2, 3]
    assert df.hashed().fingerprint() == df.fingerprint()
    assert df.dataset is df._base


def test_expression_ast(spark):
    import ast
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0], spark=spark)
    node = df["x * 2"].ast
    assert isinstance(node, ast.BinOp)


def test_can_open(tmp_path):
    import vaex_spark as vs
    assert vs.dataframe.DataFrame.can_open("foo.parquet")
    assert not vs.dataframe.DataFrame.can_open("foo.xyz")
    assert vs.dataframe.DataFrame.get_options("foo.parquet") == []


def test_matrix3d_and_spherical_velocities(spark):
    import numpy as np
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0], y=[2.0], z=[3.0], spark=spark)
    ident = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    df.add_virtual_columns_matrix3d("x", "y", "z", "xn", "yn", "zn", ident,
                                    translation=[1, 1, 1])
    assert df.evaluate("xn").tolist() == [2.0]
    assert df.evaluate("zn").tolist() == [4.0]
    df2 = vs.from_arrays(x=[1.0], y=[0.0], z=[0.0],
                         vx=[1.0], vy=[0.0], vz=[0.0], spark=spark)
    df2.add_virtual_columns_cartesian_velocities_to_spherical()
    assert np.allclose(df2.evaluate("vr"), [1.0])


def test_execute_async(spark):
    import asyncio
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0, 2.0, 3.0], spark=spark)
    s = df.sum("x", delay=True)
    asyncio.run(df.execute_async())
    assert s.get() == 6.0


def test_optional_dep_gates(spark):
    import pytest
    import vaex_spark as vs
    df = vs.from_arrays(x=[1.0], spark=spark)
    for fn in (df.plot3d, df.plot_widget, df.plot_bq, df.add_column_healpix,
               df.healpix_count, df.to_dask_array, df.to_astropy_table):
        with pytest.raises(ImportError):
            fn()
    with pytest.raises(ImportError):
        df.export_hdf5("/tmp/x.hdf5")
