"""Dump explain("formatted") for named registry queries.

Usage: python scripts/dump_r15_plans.py OUTDIR SUFFIX name [name...]
Writes OUTDIR/<name>_<SUFFIX>.txt. Used to produce the round-15
plans/r15/<query>_{before,after}.txt evidence pairs (run once from
the pre-optimization tree with SUFFIX=before, once from the
optimized tree with SUFFIX=after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_chisquare_spark.plans.registry import REGISTRY  # noqa: E402
from mapreduce_chisquare_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_r15_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"SKIP {name}", flush=True)
            continue
        try:
            df = spec[0](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            txt = f"ERROR building plan: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"dumped {name}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
