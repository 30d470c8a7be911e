"""Run any registered query from the command line:

    python -m mapreduce_chisquare_spark.runquery NAME \\
        [--sf-dir DIR] [--output DIR] [--show N] [--explain]

NAME is a key of the query registry (plans/registry.py — the same
surface the driver's correctness sweep checks). With --output the
result is written as parquet (one file per partition); otherwise the
first --show rows print to stdout. --explain prints the formatted
physical plan instead of executing.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", help="registry query name (or 'list')")
    ap.add_argument(
        "--sf-dir", default="/root/testdata/sf0.01", help="table directory"
    )
    ap.add_argument("--output", default=None, help="write parquet here")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args(argv)

    from .plans.registry import REGISTRY

    if args.name == "list":
        for n in REGISTRY:
            print(n)
        return 0
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; try 'list'", file=sys.stderr)
        return 2

    from .session import get_spark

    df = REGISTRY[args.name][0](get_spark("runquery"), args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
