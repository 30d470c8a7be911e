"""Per-query perf probe: isolate and time registry queries the way
bench.py does (1 warm-up + 3 timed runs, median, collect() action),
and optionally dump the formatted plan.

Usage:
  python scripts/perf_probe.py [--sf DIR] [--plans OUTDIR] name [name ...]

Unlike bench.py this runs ONLY the named queries, so a single
operator can be iterated on without paying for the whole headline
set; plans land as <OUTDIR>/<name>.txt (explain("formatted")).
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="dump explain('formatted') per query into this dir")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("perf_probe")
    results = {}
    for name in args.names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"SKIP {name}: not in REGISTRY")
            continue
        fn = spec[0]
        spark.sparkContext.setJobDescription(name)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for i in range(1 + args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.collect()
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
        med = statistics.median(times)
        results[name] = med
        print(f"{med:8.3f}s  {name}  (runs: {', '.join(f'{t:.3f}' for t in times)})", flush=True)
    print("TOTAL", round(sum(results.values()), 3))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
