"""Relational coverage: plan-shape checks for the TPC-H-ish queries.

Value correctness is gated by the DuckDB oracles (scripts/check_oracle.py /
the driver); these tests pin the PHYSICAL shapes that matter at 100 TB.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestRegionalRevenue:
    def test_dims_broadcast_no_cartesian(self, spark):
        """nation/region must come in as broadcast joins (O(10²) rows at
        any scale); nothing in the 6-table join may fall back to a
        cartesian/nested-loop product."""
        from indian_address_parser_spark.queries import q_join_regional_revenue

        df = q_join_regional_revenue(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_region_filter_prunes(self, spark):
        """The r_name filter must reach the region scan (predicate
        pushdown), not run post-join."""
        from indian_address_parser_spark.queries import q_join_regional_revenue

        df = q_join_regional_revenue(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "r_name" in plan


class TestEventsWindowed:
    def test_hour_alignment_and_streaming_parity(self, spark):
        """Window starts are epoch-aligned hour boundaries — identical
        bucketing to the streaming windowed counts operator."""
        from indian_address_parser_spark.queries import q_agg_events_windowed

        rows = q_agg_events_windowed(spark, SF_DIR).collect()
        assert rows
        total = sum(r["n_events"] for r in rows)
        n_input = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert total == n_input  # tumbling windows partition, never drop
        for r in rows[:50]:
            t = r["win_start"]
            assert t.minute == 0 and t.second == 0 and t.microsecond == 0

    def test_single_shuffle_plan(self, spark):
        """One hash-agg pair around one exchange — window start is a
        row-local expression, so no extra shuffle or Python node."""
        from indian_address_parser_spark.queries import q_agg_events_windowed

        df = q_agg_events_windowed(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan
