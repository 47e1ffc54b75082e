"""Piece-wise timing of the geo_customer_clusters edge subtree."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:32s} {time.perf_counter()-t0:6.3f}s", flush=True)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from osm_addr_tools_spark import queries as Q
    from osm_addr_tools_spark.functions import cells as C
    from osm_addr_tools_spark.operators.joins import (
        cell_ring_udf,
        knn_join,
        with_cell,
    )

    pts = Q._customer_points(spark, sf_dir)
    d_max = Q._CLUSTER_D_M
    ring_r = 3
    level = C.level_for_max_distance(d_max / ring_r)

    # warm UDF workers / codegen
    t("warm: pts", pts)
    t("pts", pts)
    q = with_cell(
        pts.select(F.col("c_custkey").alias("a_key"), "lon", "lat"),
        level, "lon", "lat", "_cell",
    )
    t("q cells", q)
    qr = q.withColumn("_cell", F.explode(cell_ring_udf(ring_r)(F.col("_cell"))))
    t("q cells+ring explode", qr)
    c = with_cell(
        pts.select(
            F.col("c_custkey").alias("b_key"),
            F.col("lon").alias("c_lon"),
            F.col("lat").alias("c_lat"),
        ),
        level, "c_lon", "c_lat", "_cell",
    )
    cand = qr.join(c.hint("shuffle_hash"), "_cell")
    t("cand join", cand)
    pairs = knn_join(
        pts.select(F.col("c_custkey").alias("a_key"), "lon", "lat"),
        pts.select(
            F.col("c_custkey").alias("b_key"),
            F.col("lon").alias("c_lon"),
            F.col("lat").alias("c_lat"),
        ),
        query_id="a_key", cand_id="b_key", d_max_m=d_max, k=None, ring_r=ring_r,
    )
    t("knn pairs (band)", pairs)
    edges = pairs.where(F.col("a_key") < F.col("b_key")).select("a_key", "b_key")
    e = (
        edges.select(F.col("a_key").alias("u"), F.col("b_key").alias("v"))
        .union(edges.select(F.col("b_key").alias("u"), F.col("a_key").alias("v")))
        .distinct()
    )
    t("edges sym distinct", e)
    t("edges sym distinct (again)", e)
    spark.stop()


if __name__ == "__main__":
    main()
