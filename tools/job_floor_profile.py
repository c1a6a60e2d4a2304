"""Re-profile the adjudicated job-floor query set on the current Spark.

Rounds 5-9 adjudicated the >2x bench ratios on q03/q05/q78/q80/q94/q101
as sub-second scheduling-floor walls (0.1-1.0 s Spark vs 8-30 ms DuckDB
on toy dimension tables), with the standing condition "re-profile after
a Spark upgrade".  The box now runs Spark 4.1.x (r11 verdict task 4):
count jobs per query via the status-tracker job-group API and record
walls, so the adjudication can be re-affirmed or tightened.

Usage: python tools/job_floor_profile.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

QUERIES = ["q03_revenue_by_segment", "q05_revenue_by_nation",
           "q78_domain_caps", "q80_stratified_sample",
           "q94_salted_priority_count", "q101_ivf_indexed_topk"]


@contextlib.contextmanager
def count_jobs(spark, bucket: list):
    group = f"profile-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "job-floor profile")
    try:
        yield
    finally:
        sc.setJobGroup(None, None)
    bucket.append(len(sc.statusTracker().getJobIdsForGroup(group)))


def main():
    import pyspark

    import __spark_entry__ as entry
    import vaex_spark as vs
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = vs.get_session(app_name="job_floor_profile")
    qs = entry.queries()
    print(f"# spark {pyspark.__version__} sf_dir={sf_dir}")
    for name in QUERIES:
        fn = qs[name]
        fn(spark, sf_dir).collect()          # warm: scan cache + codegen
        vs.cache.release_operator_caches()
        walls, jobs = [], []
        for _ in range(3):
            n = []
            t0 = time.time()
            with count_jobs(spark, n):
                fn(spark, sf_dir).collect()
            walls.append(time.time() - t0)
            jobs.append(n[0])
            vs.cache.release_operator_caches()
        print(f"{name}: jobs={jobs} wall_med={sorted(walls)[1]:.3f}s "
              f"walls={[round(w, 3) for w in walls]}")


if __name__ == "__main__":
    main()
