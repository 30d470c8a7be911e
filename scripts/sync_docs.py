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
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
