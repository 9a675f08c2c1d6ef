"""The engine's full named-query registry — the driver-facing surface.

``QUERIES`` maps name → QuerySpec; ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over this dict. Every operator claimed
in SURVEY.md §2 has an entry here (or a streaming twin in
streaming/pipelines.py).
"""

from __future__ import annotations

from . import corpus, events, northstar, relational
from .spec import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
for module in (corpus, relational, events, northstar):
    overlap = QUERIES.keys() & module.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    QUERIES.update(module.QUERIES)


def get_query(name: str) -> QuerySpec:
    return QUERIES[name]


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in QUERIES.items() if spec.headline}
