"""Coverage for the previously-untested surface: open_many, json/ascii
sources, vrange/vconstant/example, describe, mode, any/all aggregates,
datetime scalars, struct accessor, export_many, BinnerTime(every>1)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_open_many_and_export_many(tmp_path, spark):
    import vaex_spark as vs
    a = vs.from_arrays(x=[1, 2], spark=spark)
    b = vs.from_arrays(x=[3, 4], spark=spark)
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.export_parquet(p1, single_file=True)
    b.export_parquet(p2, single_file=True)
    both = vs.open_many([p1, p2], spark=spark)
    assert sorted(r.x for r in both.spark.collect()) == [1, 2, 3, 4]
    # open() with a list delegates
    both2 = vs.open([p1, p2], spark=spark)
    assert both2.count() == 4
    # export_many writes n files
    out = str(tmp_path / "many")
    both.export_many(out, n=3)
    assert vs.open(out, spark=spark).count() == 4


def test_from_json_and_ascii(tmp_path, spark):
    import vaex_spark as vs
    jl = tmp_path / "rows.json"
    jl.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = vs.from_json(str(jl), spark=spark, lines=True)
    assert sorted(r.a for r in df.spark.collect()) == [1, 2]
    jrec = tmp_path / "rec.json"
    jrec.write_text('[{"a": 5}, {"a": 6}]')
    df2 = vs.from_json(str(jrec), spark=spark, lines=False, orient="records")
    assert sorted(r.a for r in df2.spark.collect()) == [5, 6]
    asc = tmp_path / "t.asc"
    asc.write_text("a b\n1 10\n2 20\n")
    df3 = vs.from_ascii(str(asc), spark=spark)
    assert sorted((r.a, r.b) for r in df3.spark.collect()) == [(1, 10), (2, 20)]


def test_vrange_vconstant_example(spark):
    import vaex_spark as vs
    r = vs.vrange(2, 12, 3, spark=spark)
    assert sorted(v.x for v in r.spark.collect()) == [2, 5, 8, 11]
    c = vs.vconstant(7.5, 4, spark=spark)
    assert [v.x for v in c.spark.collect()] == [7.5] * 4
    ex = vs.example(spark=spark)
    assert ex.count() > 0


def test_describe_and_mode(lineitem):
    d = lineitem.describe()
    assert d.loc["count", "l_quantity"] == lineitem.count()
    assert abs(d.loc["mean", "l_quantity"] - lineitem.mean("l_quantity")) < 1e-9
    assert d.loc["na", "l_quantity"] == 0
    m = lineitem.mode("l_linestatus")
    assert m in ("F", "O")


def test_any_all_aggregates(spark):
    import vaex_spark as vs
    from vaex_spark import agg as vagg
    df = vs.from_arrays(g=["a", "a", "b", "b"], v=[True, False, False, False], spark=spark)
    out = {r.g: (r.any, r.all) for r in df.groupby("g", agg={
        "any": vagg.any("v"), "all": vagg.all("v")}, sort=True).spark.collect()}
    assert out == {"a": (True, False), "b": (False, False)}
    df2 = vs.from_arrays(g=["c", "c"], v=[True, True], spark=spark)
    out2 = df2.groupby("g", agg={"all": vagg.all("v")}).spark.collect()
    assert out2[0].all is True


def test_datetime_scalars_and_struct(spark):
    import vaex_spark as vs
    from vaex_spark.functions import datetime as vdt
    df = vs.from_arrays(i=[1], spark=spark)
    # struct accessor: build a struct column and read fields
    sdf = df.spark.select(F.struct(F.lit(3).alias("a"), F.lit("z").alias("b")).alias("s"))
    w = vs.DataFrame(sdf)
    assert w["s"]["a"].dtype == "int"
    got = w.spark.select(w["s"]["a"].col.alias("v")).collect()[0].v
    assert got == 3


def test_binner_time_every_per_week(spark):
    """Replicates the reference BinnerTime docstring example
    (groupby.py:72-85): daily Jan-2015 values, per_week sums."""
    import vaex_spark as vs
    t = pd.date_range("2015-01-01", "2015-01-31", freq="D")
    df = vs.from_arrays(t=list(t), y=list(range(len(t))), spark=spark)
    g = df.groupby(vs.BinnerTime.per_week(df.t), agg={"y": "sum"}, sort=True)
    rows = g.spark.collect()
    # numpy M8[W] anchors on Thursdays; 2015-01-01 IS a Thursday
    assert [r.y for r in rows] == [21, 70, 119, 168, 87]
    assert rows[0].t.strftime("%Y-%m-%d") == "2015-01-01"
    assert rows[1].t.strftime("%Y-%m-%d") == "2015-01-08"


def test_binner_time_every_quarter(spark):
    import vaex_spark as vs
    t = pd.date_range("2020-01-15", "2020-12-15", freq="MS")
    df = vs.from_arrays(t=list(t), y=[1] * len(t), spark=spark)
    from vaex_spark import agg as vagg
    g = df.groupby(vs.BinnerTime(df.t, "M", every=3), agg={"n": vagg.count()}, sort=True)
    rows = g.spark.collect()
    # anchored at Feb (min month), quarters: Feb-Apr, May-Jul, Aug-Oct, Nov-Dec
    assert [r.n for r in rows] == [3, 3, 3, 2]
    assert rows[0].t.month == 2


def test_struct_flatten(spark):
    """Reference struct.py:24 docstring example + nested recursion."""
    import pyarrow as pa
    import vaex_spark as vs
    arr = pa.StructArray.from_arrays(arrays=[pa.array([1, 2]), pa.array(["a", "b"]), pa.array([3, 4])],
                                     names=["col1", "col2", "col3"])
    df = vs.from_arrow_table(pa.table({"array": arr}), spark=spark)
    flat = df.struct.flatten()
    assert flat.get_column_names() == ["array_col1", "array_col2", "array_col3"]
    assert flat.to_pandas_df()["array_col2"].tolist() == ["a", "b"]
    # nested struct, recursive on/off
    inner = pa.StructArray.from_arrays([pa.array([10, 20])], names=["deep"])
    outer = pa.StructArray.from_arrays([pa.array([1, 2]), inner], names=["a", "b"])
    df2 = vs.from_arrow_table(pa.table({"s": outer}), spark=spark)
    assert df2.struct.flatten().get_column_names() == ["s_a", "s_b_deep"]
    assert df2.struct.flatten(recursive=False).get_column_names() == ["s_a", "s_b"]


def test_explode(spark):
    import vaex_spark as vs
    df = vs.from_arrays(k=[1, 2, 3], v=[[10, 20], [], None], spark=spark)
    out = df.explode("v")
    rows = [(r.k, r.v) for r in out.spark.collect()]
    assert rows == [(1, 10), (1, 20)]
    out2 = df.explode("v", keep_nulls=True)
    rows2 = sorted([(r.k, r.v) for r in out2.spark.collect()],
                   key=lambda t: (t[0], t[1] if t[1] is not None else -1))
    assert rows2 == [(1, 10), (1, 20), (2, None), (3, None)]


def test_connect_gate_raises_actionable_without_grpcio():
    """vs.connect() (Spark Connect shim) must fail with the actionable
    grpcio gate — probed round 6: even the in-process Connect server
    path (builder.remote('local[2]')) needs the grpc client transport,
    which is not bundled here.  If grpcio ever lands, this test flips
    to exercising a real local Connect round-trip."""
    import pytest
    import vaex_spark as vs
    try:
        import grpc  # noqa: F401
        has_grpc = True
    except ImportError:
        has_grpc = False
    if not has_grpc:
        with pytest.raises(ImportError, match="grpcio"):
            vs.connect("sc://localhost:15002")
    else:  # pragma: no cover - environment-dependent path
        from pyspark.sql import SparkSession
        s = SparkSession.builder.remote("local[2]").getOrCreate()
        try:
            df = vs.vrange(0, 10, spark=s)
            assert df.count() == 10
        finally:
            s.stop()
