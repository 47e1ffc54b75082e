"""S3b bucketed-table sink: the whole point is the PLAN — a join of two
tables bucketed identically on the join key must contain ZERO shuffle
exchanges (both sides report the same hash partitioning), and results
must equal the plain-join results exactly."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_addr_tools_spark.sources.io import write_bucketed
from tests.test_plan_shapes import plan_of


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.createDataFrame(
        pd.DataFrame({"k": [i % 500 for i in range(4000)], "va": range(4000)})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"k": [i % 450 for i in range(3000)], "vb": range(3000)})
    )
    write_bucketed(a, "t_bucket_a", "k", buckets=8)
    write_bucketed(b, "t_bucket_b", "k", buckets=8)
    yield a, b
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        p = plan_of(j)
        assert "Exchange" not in p, p  # co-located: zero shuffles
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    g = spark.table("t_bucket_a").groupBy("k").agg(F.sum("va").alias("s"))
    p = plan_of(g)
    assert "Exchange" not in p, p  # partial+final agg both local to buckets


def test_bucketed_join_equals_plain_join(spark, bucketed_tables):
    a, b = bucketed_tables
    want = sorted(map(tuple, a.join(b, "k").collect()))
    got = sorted(
        map(tuple, spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k").collect())
    )
    assert got == want and len(got) > 0
