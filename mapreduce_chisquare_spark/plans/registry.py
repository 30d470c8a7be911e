"""Merged query registry: name → (spark_builder, oracle_sql | None).

Split by domain:
- registry_text: the reference's own surface (SURVEY.md §2).
- registry_relational: join/agg/window/set-op proof over TPC-H-ish tables.
- registry_extensions: LLM-data-pipeline ops (dedup, simsearch, text
  analysis, windows, multimodal).
"""

from __future__ import annotations

from .registry_text import TEXT_QUERIES

REGISTRY: dict = {}
REGISTRY.update(TEXT_QUERIES)

try:  # widened incrementally; keep entry importable while building
    from .registry_relational import RELATIONAL_QUERIES

    REGISTRY.update(RELATIONAL_QUERIES)
except ImportError:
    pass

try:
    from .registry_extensions import EXTENSION_QUERIES

    REGISTRY.update(EXTENSION_QUERIES)
except ImportError:
    pass
