"""Extension queries (joins, windows, set ops, LLM-data ops, streaming).

Populated incrementally; each section registers into queries_registry.
"""

from __future__ import annotations
