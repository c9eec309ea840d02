"""Round-14 fixed-cost profiler: split each entry's bench time into
plan-BUILD (fn() — parse + builder + py4j + analysis + any probe jobs)
vs ACTION (the noop write), and count Spark jobs in each phase.

Protocol matches bench.py: one warm-up discarded, median of 3, noop
sink.  Job counts come from per-phase job groups via the status
tracker.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_r14.py \
        m3ql_burn_rate m3ql_multi_burn_rate ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from time_series_db_spark.catalog import QUERIES
    from time_series_db_spark.session import get_spark

    spark = get_spark("tsdb-profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = [n for n in sys.argv[1:] if n in QUERIES]
    out = {}
    for name in names:
        fn = QUERIES[name]

        def one(tag: str):
            sc.setJobGroup(f"{name}-build-{tag}", "build")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            build_jobs = len(tracker.getJobIdsForGroup(f"{name}-build-{tag}"))
            sc.setJobGroup(f"{name}-act-{tag}", "action")
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            act_jobs = len(tracker.getJobIdsForGroup(f"{name}-act-{tag}"))
            return t1 - t0, t3 - t2, build_jobs, act_jobs

        one("warm")  # warm-up — discarded
        runs = [one(f"t{i}") for i in range(3)]
        out[name] = {
            "build_sec": round(statistics.median(r[0] for r in runs), 4),
            "action_sec": round(statistics.median(r[1] for r in runs), 4),
            "build_jobs": runs[-1][2],
            "action_jobs": runs[-1][3],
            "warm_build_jobs": None,
        }
        print(
            f"{name}: build {out[name]['build_sec']:.3f}s "
            f"({out[name]['build_jobs']} jobs) + action "
            f"{out[name]['action_sec']:.3f}s ({out[name]['action_jobs']} jobs)",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
