import datetime as dt
import numpy as np
import pandas as pd
import vaex_spark as vx
import vaex_spark.agg as vagg

spark = vx.session.get_session()
b = np.array([True, False, True, True, False, True])
ts = pd.date_range("2024-01-01", periods=6, freq="h").to_numpy()
df = vx.from_arrays(i=np.arange(6), b=b, t=ts, g=np.array([0, 0, 0, 1, 1, 1]))

def trial(name, fn):
    try:
        r = fn()
        print(f"{name}: OK -> {r!r}"[:220])
    except Exception as e:
        print(f"{name}: ERR {type(e).__name__} {str(e)[:140]}")

trial("percentile_exact bool", lambda: df.percentile_exact("b", 50))
trial("percentile_approx bool", lambda: df.percentile_approx("b", 50))
trial("median_approx bool", lambda: df.median_approx("b"))
trial("mode bool", lambda: df.mode("b"))
trial("shift bool fill bool", lambda: df.shift(1, column="b", order_key="i", fill_value=False).to_pandas_df().b.tolist())
trial("shift bool fill none", lambda: df.shift(1, column="b", order_key="i").to_pandas_df().b.tolist())
trial("describe bool+ts", lambda: df.describe())
trial("rolling_range ts-value mean", lambda: df.rolling_range(7200, on="t", column="t", agg="mean").to_pandas_df().dtypes)
trial("rolling_range ts-value sum", lambda: df.rolling_range(7200, on="t", column="t", agg="sum").to_pandas_df().dtypes)
trial("groupby vagg.sem? ", lambda: [n for n in dir(vagg) if not n.startswith('_')])
trial("df.sem bool", lambda: getattr(df, 'sem', None) and df.sem("b"))
trial("rolling ts sum dtype", lambda: df.rolling(3, column="t", order_key="i").sum().to_pandas_df().dtypes)
trial("minmax ts", lambda: df.minmax("t"))
trial("groupby bool minmax", lambda: df.groupby("g", agg={"lo": vagg.min("b"), "hi": vagg.max("b")}).to_pandas_df())
trial("sum_moment ts", lambda: df.groupby("g", agg={"m2": vagg.sum_moment("t", 2)}).to_pandas_df())
trial("scalar skew bool", lambda: df.skew("b"))
trial("scalar kurt ts", lambda: df.kurtosis("t"))
trial("selection-list mean ts", lambda: df.mean("t", selection=[None, "i > 2"]))
trial("selection-list std bool", lambda: df.std("b", selection=[None, "i > 2"]))
