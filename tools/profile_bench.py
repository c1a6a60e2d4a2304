"""Per-query cost breakdown for the optimization round.

For every headline + extended bench query: plan-build wall (Python →
unresolved plan), analysis wall (schema resolution), execution wall
(the bench's own `.count()` action), job count, and the per-job stage
walls from the status tracker — so the fixed per-job floor, the
driver-side planning share, and the executor share can be separated
before any optimization is attempted (guide §1: measure first).

Usage: python tools/profile_bench.py [sf_dir] [query ...]
Writes a JSON report to /tmp/profile_bench.json and a readable table
to stdout.
"""

from __future__ import annotations

import contextlib
import json
import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def job_group(spark, bucket: list):
    group = f"profile-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "profile")
    try:
        yield
    finally:
        sc.setJobGroup(None, None)
    st = sc.statusTracker()
    ids = sorted(st.getJobIdsForGroup(group))
    bucket.append(ids)


def main():
    import bench
    import __spark_entry__ as entry
    import vaex_spark as vs

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    names = only or (bench.HEADLINE + bench.EXTENDED)

    spark = vs.get_session(app_name="profile_bench")
    spark.range(1).count()
    qs = entry.queries()

    report = {}
    for name in names:
        fn = qs[name]
        # warm (scan cache, codegen, any first-run index builds)
        fn(spark, sf_dir).count()
        vs.cache.release_operator_caches()

        runs = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            t0 = time.time()
            df.schema  # force analysis
            t_analyze = time.time() - t0
            ids = []
            t0 = time.time()
            with job_group(spark, ids):
                df.count()
            t_exec = time.time() - t0
            vs.cache.release_operator_caches()
            runs.append({"build": t_build, "analyze": t_analyze,
                         "exec": t_exec, "n_jobs": len(ids[0]),
                         "total": t_build + t_analyze + t_exec})
        med = min(runs, key=lambda r: r["total"])  # best-of-3: floor view
        report[name] = {
            "build_s": round(med["build"], 4),
            "analyze_s": round(med["analyze"], 4),
            "exec_s": round(med["exec"], 4),
            "total_s": round(med["total"], 4),
            "n_jobs": med["n_jobs"],
            "total_med3_s": round(statistics.median(
                r["total"] for r in runs), 4),
        }
        r = report[name]
        print(f"{name:36s} total {r['total_s']:7.3f}  build {r['build_s']:6.3f}"
              f"  analyze {r['analyze_s']:6.3f}  exec {r['exec_s']:7.3f}"
              f"  jobs {r['n_jobs']:3d}", flush=True)

    with open("/tmp/profile_bench.json", "w") as f:
        json.dump(report, f, indent=1)
    drv = sum(v["build_s"] + v["analyze_s"] for v in report.values())
    exe = sum(v["exec_s"] for v in report.values())
    print(f"# driver-side (build+analyze) {drv:.2f}s, exec {exe:.2f}s, "
          f"jobs {sum(v['n_jobs'] for v in report.values())}")


if __name__ == "__main__":
    main()
