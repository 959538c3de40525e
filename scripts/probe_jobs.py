#!/usr/bin/env python3
"""Time a registered query and count the driver-synced Spark jobs it
submits (guide §5 — the fixed cost this host's bench is dominated by,
and the thing that serializes a 100 TB run behind the driver).

Job counting uses a job group: every job submitted from this thread
during construction+execution (eager localCheckpoints included) lands
in the group, and statusTracker().getJobIdsForGroup() reports them.

Usage: python scripts/probe_jobs.py [--sf-dir DIR] [--runs 3] name ...
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from poet_cloud_cost_etl_spark.config import EngineConfig
    from poet_cloud_cost_etl_spark.queries import QUERIES
    from poet_cloud_cost_etl_spark.session import build_session

    cfg = EngineConfig.from_env()
    spark = build_session(app_name="probe-jobs", **cfg.session_kwargs())
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    for name in args.names:
        # warm-up (untimed, ungrouped)
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs, jobs = [], []
        for i in range(args.runs):
            for rdd in sc._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            group = f"{name}-probe-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        print(
            f"{name}: median {statistics.median(runs):.3f}s "
            f"runs={[round(r, 3) for r in runs]} jobs={jobs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
