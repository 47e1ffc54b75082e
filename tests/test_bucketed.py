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


def test_bucketed_one_sorted_file_per_bucket(spark, bucketed_tables):
    """ADVICE r5: without a pre-repartition on the key, every upstream
    task writes one file per bucket it sees (tasks x buckets files), and
    sortBy holds only per FILE. With the repartition, each bucket is
    exactly one file and that file is globally sorted on the key."""
    import os
    import re

    import pyarrow.parquet as pq

    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED t_bucket_a")
        .where(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    path = loc.replace("file:", "")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    buckets = {}
    for f in files:
        m = re.search(r"_(\d{5})(?:_\d+)?\.c", f) or re.search(r"_(\d{5})\.", f)
        assert m, f
        buckets.setdefault(int(m.group(1)), []).append(f)
    # one file per non-empty bucket
    assert all(len(v) == 1 for v in buckets.values()), buckets
    assert len(buckets) == 8
    # and each file is sorted on the key
    for b, (f,) in buckets.items():
        ks = pq.read_table(os.path.join(path, f), columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), f
