"""Physical-plan assertions: each operator must produce the plan we'd
want at 100 TB — filters pushed to the scan, projections pruned,
dimension joins broadcast, top-k compiled to TakeOrderedAndProject.
This is the scale checklist from the build brief, mechanized."""

from __future__ import annotations

from datafusion_streams_spark.operators import REGISTRY
from datafusion_streams_spark.plans import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)
from tests.conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["filter_project_pushdown"].fn(spark, SF_DIR)
    assert has_pushed_filters(df), "filters must push into the parquet scan"
    cols = set(read_schema_columns(df))
    assert "l_extendedprice" in cols and "l_comment" not in cols
    assert len(cols) <= 6, f"scan reads too many columns: {cols}"


def test_q6_scan_is_narrow(spark):
    df = REGISTRY["q6_revenue_forecast"].fn(spark, SF_DIR)
    cols = set(read_schema_columns(df))
    assert cols <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, cols
    assert has_pushed_filters(df)


def test_dim_joins_are_broadcast(spark):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume", "join_broadcast_dim"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        assert uses_broadcast_join(df), f"{name} should broadcast its dimension side"


def test_global_topk_avoids_total_sort(spark):
    df = REGISTRY["sort_topk_global"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER BY must compile to top-k"


def test_q1_partial_aggregation(spark):
    plan = formatted_plan(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))
    assert "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2, "expect partial + final aggregate"


def test_bucketed_join_avoids_shuffle(spark):
    """Bucketing: co-located join with NO exchange on either side — the
    pre-shuffled layout a recurring 100 TB join would use."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = lb.join(ob.hint("merge"), lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_extendedprice"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_table_statistics_for_cbo(spark):
    """The reference's ExecutionPlan::statistics() is an unimplemented
    todo!() (/root/reference/src/kafka/execution.rs:114-116) — no
    cost-based decision can see through its node. Spark's stats
    machinery, by contrast: ANALYZE TABLE computes row counts +
    column stats that the CBO consumes."""
    spark.read.parquet(f"{SF_DIR}/nation.parquet").write.mode("overwrite").saveAsTable(
        "nation_stats"
    )
    try:
        spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name")
        stats_row = [
            r for r in spark.sql("DESCRIBE TABLE EXTENDED nation_stats").collect()
            if r.col_name == "Statistics"
        ]
        assert stats_row, "ANALYZE must persist table statistics"
        assert "rows" in stats_row[0].data_type  # e.g. '3187 bytes, 25 rows'
        col = spark.sql("DESCRIBE EXTENDED nation_stats n_nationkey").collect()
        kv = {r.info_name: r.info_value for r in col}
        assert kv.get("distinct_count") not in (None, "NULL"), kv
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats")
