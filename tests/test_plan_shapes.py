"""Physical-plan shape gates (SURVEY.md §4): these assert the *plans*, not
the results — predicate pushdown reaches the parquet scan, small sides
broadcast, spatial joins never degenerate into nested-loop joins, and the
relational core stays inside whole-stage codegen."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p or "LessThanOrEqual(l_shipdate" in p
    # column pruning: read schema carries only the 3 referenced columns
    assert "l_extendedprice" not in p.split("ReadSchema")[1].split("\n")[0]


def test_gazetteer_geocode_is_broadcast_join(spark):
    from osm_addr_tools_spark.plans.extract import run_extract
    from osm_addr_tools_spark.sources import synth as S

    out = run_extract(spark, S.synth_pages(spark, 50), S.synth_gazetteer(spark, 50))
    p = plan_of(out)
    assert "BroadcastHashJoin" in p


def test_no_nested_loop_join_in_conflate(spark):
    from osm_addr_tools_spark.plans.conflate import run_conflate
    from osm_addr_tools_spark.plans.extract import run_extract
    from osm_addr_tools_spark.sources import synth as S

    addrs = run_extract(spark, S.synth_pages(spark, 50), S.synth_gazetteer(spark, 50))
    m = run_conflate(
        spark, addrs, S.synth_buildings(spark, 50), S.synth_existing(spark, 50)
    )
    p = plan_of(m)
    # the J8 design rule: theta predicates are always equi-join + residual
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_salted_join_replicates_build_side_only(spark):
    import pandas as pd

    from osm_addr_tools_spark.operators.joins import salted_join

    a = spark.createDataFrame(pd.DataFrame({"k": [1] * 100 + [2] * 5, "v": range(105)}))
    b = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "w": [10, 20]}))
    out = salted_join(a, b, "k", F.col("v"), hot_threshold=10, rows_per_task=25)
    p = plan_of(out)
    assert p.count("Generate") >= 1  # explode of salt range on build side
    assert len(out.columns) == {"k", "v", "w"}.__len__()


def test_q1_stays_in_whole_stage_codegen(spark):
    from osm_addr_tools_spark import queries as Q

    df = Q.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    df.collect()  # AQE only shows codegen spans in the executed final plan
    p = plan_of(df)
    # formatted mode marks whole-stage-codegen operators with a leading '*'
    assert "* HashAggregate" in p and "* ColumnarToRow" in p or "* Sort" in p
    assert "ArrowEvalPython" not in p  # no Python in the relational core


def test_knn_join_distance_math_is_jvm_side(spark):
    import re

    from osm_addr_tools_spark import queries as Q

    p = plan_of(Q.QUERIES["geo_knn_nearest_supplier"](spark, SF_DIR))
    # four Arrow nodes at most: query cell encode, the neighbor UDF (split
    # from the explode projection), pre-explode projection, candidate cell
    # encode — haversine/rank/filter are JVM Column math
    node_ids = set(re.findall(r"\((\d+)\) ArrowEvalPython", p))
    assert len(node_ids) <= 4, node_ids
    assert "BroadcastNestedLoopJoin" not in p


def test_knn_level_assertion_fires():
    from osm_addr_tools_spark.functions.cells import level_for_max_distance

    with pytest.raises(ValueError):
        level_for_max_distance(10**9)  # bigger than a face


def test_pack_assign_window_is_bucket_partitioned(spark):
    # the per-bucket rank must come from the grouped prefix-sum core:
    # every Window in the plan is partitioned by (_psb, bucket_cap) —
    # never an empty or bucket-only partition spec (which would run the
    # whole corpus on ~5 window tasks)
    import osm_addr_tools_spark.queries as Q

    p = plan_of(Q.QUERIES["docs_pack_assign"](spark, SF_DIR))
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p
    for line in p.splitlines():
        if "partitionBy=" in line:
            assert "_psb" in line, line


def test_decontaminate_joins_on_gram_no_nested_loop(spark):
    import osm_addr_tools_spark.queries as Q

    p = plan_of(Q.QUERIES["docs_decontaminate"](spark, SF_DIR))
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p
    assert "gram" in p  # equi-join key survives into the physical plan
