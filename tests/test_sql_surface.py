"""The engine's SQL entry point: the same queries issued as ANSI SQL
through ``spark.sql`` over registered table views.

The reference has no SQL surface at all — every query is a compiled
Map/Reduce plugin (SURVEY.md §3.3). Here the oracle SQL strings double
as a *user-facing* query language: every dialect-portable oracle must
run unmodified through Spark SQL and produce bit-identical results to
its DataFrame twin (same canonicalization the driver uses). That
proves the DataFrame plans and the SQL planner agree, and that a user
can drive the engine from either API.

The non-portable remainder use DuckDB-only spellings (``unnest``,
``quantile_cont``, ``[...]`` list literals, ``->>`` JSON arrows,
parameterless VARCHAR casts, ``ORDER BY`` inside string_agg) — their
Spark execution is covered by the DataFrame parity tests; re-spelling
every oracle twice buys no new coverage, so they are excluded by
explicit list, not silently.
"""

from __future__ import annotations

import pytest

from mapreduce_cs416_spark.plans.registry import EXTRA_QUERIES, QUERIES
from mapreduce_cs416_spark.sources.tables import register_views
from mapreduce_cs416_spark.testing import _canon_rows, spark_rows

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}

# every oracle that is dialect-portable Spark SQL; additions to the
# registry that stay portable should be added here (test_no_rot below
# fails if one of these loses its oracle or leaves the registry)
SQL_PORTABLE = (
    "approx_distinct",
    "cube_agg",
    "dedup_exact",
    "distinct_agg",
    "distinct_suite",
    "events_attribution_join",
    "events_session",
    "events_sliding",
    "events_tumbling",
    "exists_subquery",
    "grouping_sets_agg",
    "grouping_variants",
    "join_anti",
    "join_outer_agg",
    "join_semi",
    "map_funcs",
    "pivot_events",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_late_lines_by_class",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q20_excess_stock_suppliers",
    "q21_suppliers_kept_waiting",
    "q22_prospects",
    "range_band_join",
    "rollup_agg",
    "scalar_conditional_funcs",
    "scalar_math_funcs",
    "set_ops",
    "top_customers_revenue",
    "window_frames",
    "window_lag",
    "window_rank",
    "window_running",
)


@pytest.fixture(scope="module")
def sql_views(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark


def test_no_rot():
    missing = [n for n in SQL_PORTABLE if n not in ALL_QUERIES or ALL_QUERIES[n].oracle is None]
    assert not missing, f"SQL_PORTABLE entries without an oracled registry entry: {missing}"


@pytest.mark.parametrize("name", SQL_PORTABLE)
def test_sql_matches_dataframe(sql_views, sf_dir, name):
    spec = ALL_QUERIES[name]
    s_cols, s_rows = spark_rows(sql_views.sql(spec.oracle))
    d_cols, d_rows = spark_rows(spec.fn(sql_views, sf_dir))
    assert sorted(s_cols) == sorted(d_cols), f"{name}: schema {s_cols} != {d_cols}"
    assert _canon_rows(s_cols, s_rows) == _canon_rows(d_cols, d_rows), name
