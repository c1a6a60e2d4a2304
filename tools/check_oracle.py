"""Local oracle checker mirroring the driver's comparison:
run each queries() entry on Spark and its oracle_sql() on DuckDB at a
given sf, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for comparison
    def canon(v):
        if isinstance(v, (np.floating, float)):
            if pd.isna(v):
                return "NaN"
            return f"{float(v):.9g}"
        if isinstance(v, (np.integer, int)):
            return str(int(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda col: col.map(canon))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    import vaex_spark as vsp

    spark = vsp.get_session()
    # VS_ADVERSARIAL=1: force the multi-partition code paths (tiny
    # advisory partitions + odd shuffle count) — the configuration that
    # exposed the round-3 window branch-misalignment bug.  Results must
    # be identical to the default-config sweep.
    import os
    if os.environ.get("VS_ADVERSARIAL"):
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        print("# adversarial conf: advisory=8KB shuffle.partitions=13")
    # VS_ANSI=1: run the whole battery on an ANSI-ON session (the Spark 4
    # foreign-session default) — r11 made every zero-capable division
    # route through try_divide/try_mod, so the degenerate contract (and
    # therefore every oracle result) must be conf-independent.  Note the
    # oracle data contains no overflow/bad-cast plants, so remaining
    # ANSI divergence (overflow wraps, bad casts) is out of this sweep's
    # scope by design — see _warn_if_ansi.
    if os.environ.get("VS_ANSI"):
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("# ansi conf: spark.sql.ansi.enabled=true")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spd)} rows)")
            n_pass += 1
            continue
        try:
            dpd = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if len(spd) != len(dpd):
            print(f"FAIL {name}: row count {len(spd)} vs {len(dpd)}")
            n_fail += 1
            continue
        if sorted(spd.columns) != sorted(dpd.columns):
            print(f"FAIL {name}: columns {sorted(spd.columns)} vs {sorted(dpd.columns)}")
            n_fail += 1
            continue
        a, b = normalize(spd), normalize(dpd)
        if a.equals(b):
            print(f"ok   {name}: {len(spd)} rows, values match")
            n_pass += 1
        else:
            diff_mask = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff_mask.sum())}/{len(a)} rows differ; first diffs:")
            bad = diff_mask[diff_mask].index[:3]
            for i in bad:
                print(f"  spark : {a.loc[i].to_dict()}")
                print(f"  duckdb: {b.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
