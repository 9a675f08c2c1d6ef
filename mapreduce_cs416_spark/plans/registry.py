"""The engine's full named-query registry — the driver-facing surface.

``QUERIES`` maps name → QuerySpec; ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over this dict. Every operator claimed
in SURVEY.md §2 has an entry here (or a streaming twin in
streaming/pipelines.py).
"""

from __future__ import annotations

from . import corpus, entity, events, northstar, relational, tpch
from .spec import QuerySpec

# The round driver records the FIRST 50 entries of queries() into
# CORRECTNESS_r{N}.json; everything must fit or trailing queries are
# silently never verified (this bit rounds 1-3: 14 northstar queries
# sat past the window). Consolidated driver rows (scalar_part_kernels,
# grouping_variants, *_doc_profile, ...) keep every operator family
# inside the window; the granular twins live in EXTRA_QUERIES and are
# oracle-checked by tests/test_parity.py instead.
DRIVER_WINDOW = 50

QUERIES: dict[str, QuerySpec] = {}
EXTRA_QUERIES: dict[str, QuerySpec] = {}
for module in (corpus, relational, events, northstar, tpch, entity):
    extra = getattr(module, "EXTRA_QUERIES", {})
    overlap = (QUERIES.keys() | EXTRA_QUERIES.keys()) & (module.QUERIES.keys() | extra.keys())
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    QUERIES.update(module.QUERIES)
    EXTRA_QUERIES.update(extra)

if len(QUERIES) > DRIVER_WINDOW:
    raise RuntimeError(
        f"{len(QUERIES)} driver queries exceed the {DRIVER_WINDOW}-entry "
        "CORRECTNESS window — consolidate or move twins to EXTRA_QUERIES"
    )


# Everything, driver window + extras — the bench and parity surfaces.
ALL_QUERIES: dict[str, QuerySpec] = {**QUERIES, **EXTRA_QUERIES}


def get_query(name: str) -> QuerySpec:
    return ALL_QUERIES[name]


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QuerySpec]:
    """The bench.py timed set — headline-flagged specs from BOTH dicts
    (the driver CORRECTNESS window caps QUERIES at 50, but the bench
    set is independent of that cap: q9/q21 are EXTRA_QUERIES entries
    benched as headline warehouse shapes)."""
    return {name: spec for name, spec in ALL_QUERIES.items() if spec.headline}
