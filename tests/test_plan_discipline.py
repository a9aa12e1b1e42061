"""Physical-plan discipline (north rule): all hot-path logic runs in
vectorized Arrow batches or pure JVM expressions — ``BatchEvalPython``
(row-at-a-time Python UDF) must never appear in any query plan; Python in
plans is allowed only as ``ArrowEvalPython`` / ``MapInPandas`` /
``FlatMapGroupsInPandas`` (Arrow-batched). Also checks that the broadcast
hints actually produce broadcast joins in the report query.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unpartitioned_windows(df) -> list:
    """Window nodes in the OPTIMIZED logical plan with an empty partition
    spec — checked post-optimizer because PySpark 4's
    EliminateWindowPartitions folds constant partition keys (the old
    ``partitionBy(lit(0))`` idiom) down to exactly this case."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return [
        n for n in nodes
        if n.get("class", "").endswith("logical.Window")
        and not n.get("partitionSpec")
    ]


@pytest.mark.parametrize("name", sorted(entrymod.queries_all()))
def test_no_row_at_a_time_python(spark, name):
    df = entrymod.queries_all()[name](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert not _unpartitioned_windows(df), (
        f"{name}: unpartitioned Window in optimized plan (all-to-one-"
        "partition sort); use a partitioned window or "
        "functions/ranking.bounded_global_rank"
    )


def test_arrow_python_where_expected(spark):
    """The two deliberately-Python stages are Arrow-batched in the plan."""
    fuzzy = entrymod.queries_all()["fuzzy_date_parse"](spark, SF_DIR)
    assert "ArrowEvalPython" in _physical_plan(fuzzy)
    mm = entrymod.queries_all()["multimodal_features"](spark, SF_DIR)
    assert "MapInPandas" in _physical_plan(mm)


def test_report_joins_are_broadcast(spark):
    plan = _physical_plan(entrymod.queries_all()["report_daily"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle


def test_embedding_near_dup_is_bucketed(spark):
    """The embedding near-dup scale path must be an equi-join on the LSH
    probe bucket — never the all-pairs BroadcastNestedLoopJoin the exact
    baseline plans as (VERDICT r1 'What's wrong #4')."""
    plan = _physical_plan(entrymod.queries_all()["embedding_near_dup"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scan_prunes_columns(spark):
    """Column pruning reaches the parquet scan: the report query must not
    read unused wide columns (ReadSchema limited to what the plan needs)."""
    plan = _physical_plan(entrymod.queries_all()["report_daily"](spark, SF_DIR))
    assert "o_orderpriority" not in plan
    assert "o_orderstatus" not in plan
