"""Quick smoke of the r14 fixes (run: python tools/smoke_r14.py)."""
import datetime as dt

import numpy as np
import pandas as pd

import vaex_spark as vx

spark = vx.session.get_session()

# 1. take(): negative wrap + OOB raise + order preserved
df = vx.from_arrays(x=np.arange(10), y=np.arange(10) * 2.0)
t = df.take([0, -1, 3, 3]).to_pandas_df()
assert list(t.x) == [0, 9, 3, 3], t
try:
    df.take([10])
    raise SystemExit("FAIL: take([10]) did not raise")
except IndexError as e:
    print("take OOB raises:", e)
try:
    df.take([-11])
    raise SystemExit("FAIL: take([-11]) did not raise")
except IndexError:
    pass
print("take parity OK")

# 2. rolling over bool
b = np.array([True, False, True, True, False, True])
dfb = vx.from_arrays(i=np.arange(6), b=b)
for kind, oracle in [
    ("sum", pd.Series(b).rolling(3).sum()),
    ("mean", pd.Series(b).rolling(3).mean()),
    ("std", pd.Series(b).rolling(3).std(ddof=0)),
    ("var", pd.Series(b).rolling(3).var(ddof=0)),
    ("count", pd.Series(b).rolling(3).count()),
]:
    r = getattr(dfb.rolling(3, column="b", order_key="i"), kind)()
    got = r.to_pandas_df().sort_values("i").b.to_numpy(dtype="float64")
    want = oracle.to_numpy(dtype="float64")
    assert np.allclose(got, want, equal_nan=True), (kind, got, want)
print("rolling bool OK")

# rolling_range over bool
ts = pd.date_range("2024-01-01", periods=6, freq="s")
dfr = vx.from_arrays(t=ts.to_numpy(), b=b)
rr = dfr.rolling_range(3, on="t", column="b", agg="sum").to_pandas_df()
want = pd.Series(b, index=ts).rolling("3s").sum().to_numpy()
got = rr.sort_values("t").b_rolling_sum.to_numpy(dtype="float64")
assert np.allclose(got, want), (got, want)
print("rolling_range bool OK")

# 3. binby over a DATE column (was: every row -> null bin silently)
dates = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"])
dfd = vx.from_arrays(d=dates.date, v=np.arange(4.0))
grid = dfd.count(binby="d", shape=4)
assert grid.sum() == 4, grid
print("binby date OK:", grid)

# limits over a date column directly
lims = vx.operators.binby.compute_limits(dfd, "d")
assert lims[1] > lims[0] > 1.7e9, lims
print("date limits OK:", lims)

# 4. sum over timestamps: scalar / groupby / binby consistent (epoch-µs)
tcol = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]).to_numpy()
dft = vx.from_arrays(t=tcol, g=np.array([0, 0, 1]))
mu = tcol.astype("datetime64[us]").astype("int64")
s = dft.sum("t")
assert int(s) == int(mu.sum()), (s, mu.sum())
import vaex_spark.agg as vagg
g = dft.groupby("g", agg={"ts": vagg.sum("t")}).to_pandas_df().sort_values("g")
assert list(g.ts.astype("int64")) == [int(mu[:2].sum()), int(mu[2])], g
grid = dft.sum("t", binby="g", shape=2, limits=[0, 1])
print("temporal sum OK (scalar/groupby/binby):", s, list(g.ts), grid)

# 5. temporal var binby: empty bin reads NaN not 0
dfe = vx.from_arrays(t=tcol, x=np.array([0.0, 0.0, 5.0]))
gv = dfe.var("t", binby="x", shape=2, limits=[0, 10])
# bin 1 covers x in [5,10) -> a single real row -> true var 0.0
assert gv[1] == 0.0, gv
gv2 = dfe.var("t", binby="x", shape=4, limits=[0, 4])
assert np.isnan(gv2[2]) and np.isnan(gv2[3]), gv2
print("temporal var binby fill OK:", gv, gv2)

# 6. odd-name quoting still round-trips through the hoisted helper
dfo = vx.from_arrays(**{"a b": np.arange(3), "c.d": np.arange(3) * 1.0})
assert dfo["a b"].sum() == 3
assert float(dfo.mean("c.d")) == 1.0
st = dfo.state_get()
print("odd names OK")

print("ALL SMOKE OK")
