"""Plan-efficiency contracts: batched binby limit stats, distributed
export default, join guard opt-out."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def test_binby_auto_limits_one_stats_pass(lineitem):
    df = lineitem
    before = df.executor.passes
    grid = df.count(binby=["l_quantity", "l_extendedprice"], shape=8, limits=None)
    assert grid.shape == (8, 8)
    # both dims' min/max ran as ONE batched executor pass
    assert df.executor.passes == before + 1


def test_export_parquet_modes(tmp_path, base_df, spark):
    import vaex_spark as vs
    # default: distributed directory write
    p_dir = str(tmp_path / "dist.parquet")
    base_df.export_parquet(p_dir)
    import os
    assert os.path.isdir(p_dir)
    assert vs.open(p_dir, spark=spark).count() == 21
    # opt-in single file
    p_one = str(tmp_path / "one.parquet")
    base_df.export_parquet(p_one, single_file=True)
    assert os.path.isfile(p_one)
    assert pq.read_table(p_one).num_rows == 21


def test_join_guard_modes(spark):
    import vaex_spark as vs
    left = vs.from_arrays(k=[1, 2, 3], a=[10, 20, 30], spark=spark)
    right_dup = vs.from_arrays(k=[1, 1, 2], b=[5, 6, 7], spark=spark)
    with pytest.raises(ValueError, match="duplicate"):
        left.join(right_dup, on="k", how="inner")
    # True and None both permit duplication; None skips the pre-scan
    out_true = left.join(right_dup, on="k", how="inner", allow_duplication=True)
    out_none = left.join(right_dup, on="k", how="inner", allow_duplication=None)
    assert out_true.spark.count() == out_none.spark.count() == 3
