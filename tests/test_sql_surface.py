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


class TestManifestSQLFace:
    """VERDICT r13 item 7: pure-SQL users reach the lakehouse layer —
    ``create_sql_table`` registers a manifest table (or group member)
    under a name; SELECTs match ``read_table`` exactly, time travel
    works, and predicates on the registered name push down to the
    parquet scan. Also pins the UPSTREAM gap that makes this a view
    instead of real DDL: a ``CREATE TABLE ... USING manifest`` catalog
    table loses its OPTIONS at read time on Spark 4.1 (PythonTable's
    scan gets an empty options map) — when a Spark upgrade flips that
    pin, replace the view face with real DDL."""

    def _mk(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from mapreduce_cs416_spark.sources import manifest as mf

        root = str(tmp_path / "tbl")
        df = spark.range(0, 64).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        mf.create_table(df, root, ["k"], n_buckets=4)  # v1
        mf.append_into(
            spark, root, spark.createDataFrame([(100, 7)], "k long, v long")
        )  # v2
        return root

    def test_select_matches_read_table_and_time_travels(self, spark, tmp_path):
        from mapreduce_cs416_spark.sources import manifest as mf
        from mapreduce_cs416_spark.sources.manifest_source import create_sql_table

        root = self._mk(spark, tmp_path)
        create_sql_table(spark, "mtab", root)
        got = sorted(
            tuple(r) for r in spark.sql("SELECT k, v FROM mtab").collect()
        )
        want = sorted(tuple(r) for r in mf.read_table(spark, root).collect())
        assert got == want and len(got) == 65
        # aggregation through pure SQL
        assert spark.sql("SELECT sum(v) AS s FROM mtab").collect()[0]["s"] == sum(
            v for _, v in want
        )
        # time travel face
        create_sql_table(spark, "mtab_v1", root, version=1)
        assert spark.sql("SELECT count(*) AS n FROM mtab_v1").collect()[0]["n"] == 64
        # re-registering refreshes to the newest version
        mf.append_into(
            spark, root, spark.createDataFrame([(101, 8)], "k long, v long")
        )
        create_sql_table(spark, "mtab", root)
        assert spark.sql("SELECT count(*) AS n FROM mtab").collect()[0]["n"] == 66
        spark.catalog.dropTempView("mtab")
        spark.catalog.dropTempView("mtab_v1")

    def test_predicates_push_down_to_parquet(self, spark, tmp_path):
        from mapreduce_cs416_spark.sources.manifest_source import create_sql_table

        root = self._mk(spark, tmp_path)
        create_sql_table(spark, "mtab_push", root)
        plan = (
            spark.sql("SELECT v FROM mtab_push WHERE k = 3")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the JVM parquet lane: filter reaches the scan, projection
        # prunes the read schema
        assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters:")[1][:80]
        spark.catalog.dropTempView("mtab_push")

    def test_group_member_sql_face(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from mapreduce_cs416_spark.sources import table_group as tg
        from mapreduce_cs416_spark.sources.manifest_source import create_sql_table

        root = str(tmp_path / "grp")
        facts = spark.range(0, 16).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        tg.create_group(
            spark, root, {"facts": {"df": facts, "key_cols": ["k"], "n_buckets": 2}}
        )
        create_sql_table(spark, "gfacts", root, member="facts")
        assert spark.sql("SELECT sum(v) AS s FROM gfacts").collect()[0]["s"] == sum(
            3 * i for i in range(16)
        )
        spark.catalog.dropTempView("gfacts")

    def test_upstream_catalog_options_gap_pinned(self, spark, tmp_path):
        """CREATE TABLE ... USING manifest parses and infers the schema
        (options ARE present at create time), but the catalog-table
        SELECT reaches the python reader with an EMPTY options map on
        Spark 4.1 — the documented reason create_sql_table is a view.
        If this starts passing after a Spark upgrade, wire real DDL."""
        from mapreduce_cs416_spark.sources.manifest_source import (
            register_manifest_source,
        )

        root = self._mk(spark, tmp_path)
        register_manifest_source(spark)
        spark.sql(f"CREATE TABLE mddl USING manifest OPTIONS (path '{root}')")
        try:
            # schema inference at CREATE time saw the path option
            assert [f.name for f in spark.table("mddl").schema.fields] == ["k", "v"]
            with pytest.raises(Exception, match="path"):
                spark.table("mddl").collect()
        finally:
            spark.sql("DROP TABLE mddl")
