"""Dump `.explain("formatted")` for a list of declared queries into
per-query text files (the r14 optimization round's before/after plan
evidence — run once from the round-start checkout into *_before.txt
and once from HEAD into *_after.txt).

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    import vaex_spark as vs
    import __spark_entry__ as entry
    spark = vs.get_session(app_name="dump_plans")
    qs = entry.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted") \
            if hasattr(df._sc._jvm, "PythonSQLUtils") else None
        if plan is None:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, suffix, flush=True)
        vs.cache.release_operator_caches()


if __name__ == "__main__":
    main()
