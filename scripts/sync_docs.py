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

README = Path(__file__).resolve().parent.parent / "README.md"
COUNT_RE = re.compile(r"`queries\(\)` \((\d+) named operators")


def main() -> int:
    check = "--check" in sys.argv
    text = README.read_text()
    m = COUNT_RE.search(text)
    if not m:
        print("README count marker not found", file=sys.stderr)
        return 1
    n = len(REGISTRY)
    if int(m.group(1)) == n:
        print(f"README in sync ({n} registry entries)")
        return 0
    if check:
        print(f"README stale: says {m.group(1)}, registry has {n}")
        return 1
    README.write_text(
        COUNT_RE.sub(f"`queries()` ({n} named operators", text)
    )
    print(f"README updated: {m.group(1)} -> {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
