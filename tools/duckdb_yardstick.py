"""Same-machine DuckDB yardstick for the bench letter.

Times each bench HEADLINE query's oracle SQL in DuckDB on the same
parquet files bench.py reads, and prints one JSON line with per-query
seconds plus the Spark/DuckDB ratio if a bench result is supplied:

    python bench.py > /tmp/bench.json
    python tools/duckdb_yardstick.py [sf_dir] [/tmp/bench.json]

BASELINE.md carries no absolute reference numbers, so this ratio is the
honest stand-in: both engines run identical SQL-equivalent work on
identical files on the same box.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else None

    import bench
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    times = {}
    for name in bench.HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (page cache + plan)
        t0 = time.time()
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 4)

    total = round(sum(times.values()), 4)
    out = {"metric": "duckdb_oracle_wall", "value": total, "unit": "sec",
           "queries": times, "sf_dir": sf_dir}
    if bench_path:
        with open(bench_path) as fh:
            spark_total = json.load(fh)["value"]
        out["spark_total"] = spark_total
        out["spark_over_duckdb"] = round(spark_total / total, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
