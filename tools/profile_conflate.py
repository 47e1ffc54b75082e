"""Piece-wise timing of the conflate_join headline query (bench session
config, stored parquet inputs — same shape bench.py times)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def t(label, df, n=1):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    print(f"{label:36s} {best:7.3f}s", flush=True)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = "/tmp/spark_graft_bench_0.1_100000"
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from osm_addr_tools_spark.plans import conflate as CF
    from osm_addr_tools_spark.operators.joins import knn_join, pip_join

    addrs = spark.read.parquet(f"{base}/addrs").withColumn("geocoded", F.lit(True))
    buildings = spark.read.parquet(f"{base}/buildings")
    existing = spark.read.parquet(f"{base}/existing")

    a = addrs.where(F.col("geocoded")).drop("geocoded")
    t("warm: a scan", a)
    t("a scan", a)

    ex = CF.keyed_existing(existing)
    t("keyed_existing (norm UDF)", ex, 2)

    w_key = Window.partitionBy("addr_key").orderBy(F.col("node_id").asc())
    ex_best = (
        ex.withColumn("_rn", F.row_number().over(w_key))
        .where(F.col("_rn") == 1)
        .select("addr_key", F.col("node_id").alias("k_node"),
                "has_postcode", "e_lon", "e_lat", "e_tags")
    )
    t("ex_best (window)", ex_best, 2)

    # fuzzy piece
    va = a.select("city_norm", F.col("street_norm").alias("_a_street")).distinct()
    ve = ex.select("city_norm", F.col("street_norm").alias("_e_street")).distinct()
    la, lb = F.length("_a_street"), F.length("_e_street")
    pair_ratio = (
        va.join(ve, "city_norm")
        .where(F.col("_e_street") != F.col("_a_street"))
        .select("_a_street", "_e_street")
        .distinct()
        .where(2.0 * F.least(la, lb) >= F.lit(0.75) * (la + lb))
        .withColumn("_ratio", CF.street_similarity_udf(0.75)(
            F.col("_a_street"), F.col("_e_street")))
        .where(F.col("_ratio") >= F.lit(0.75))
    )
    t("fuzzy pair_ratio", pair_ratio, 2)
    exp = ex.select(
        F.col("node_id").alias("f_node"),
        F.col("e_lon").alias("f_lon"),
        F.col("e_lat").alias("f_lat"),
        F.col("e_tags").alias("f_tags"),
        F.col("has_postcode").alias("f_has_pc"),
        "city_norm", "hn_norm",
        F.col("street_norm").alias("_e_street"),
    ).join(pair_ratio.hint("shuffle_hash"), "_e_street")
    f_cand = a.select(
        "url", "addr_key", "city_norm", "hn_norm",
        F.col("street_norm").alias("_a_street"),
    ).join(exp.hint("shuffle_hash"), ["city_norm", "hn_norm", "_a_street"])
    w_fuzzy = Window.partitionBy("url", "addr_key").orderBy(
        F.col("_ratio").desc(), F.col("f_node").asc())
    fuzzy_best = (
        f_cand.withColumn("_rn", F.row_number().over(w_fuzzy))
        .where(F.col("_rn") == 1)
        .select("url", "addr_key", "f_node", "f_has_pc", "f_lon", "f_lat", "f_tags")
    )
    t("fuzzy_best full", fuzzy_best, 2)

    # containment piece
    unaddressed = buildings.where(
        ~F.map_contains_key(F.col("tags"), F.lit("addr:housenumber"))
    ).select("building_id", "rings")
    bb = pip_join(a.select("url", "addr_key", "lon", "lat"), unaddressed,
                  CF.CONTAINMENT_LEVEL, salt=True,
                  hot_threshold=100_000, rows_per_task=50_000)
    best_building = bb.groupBy("url", "addr_key").agg(
        F.min("building_id").alias("b_ref"))
    t("pip_join+agg (containment)", best_building, 2)

    # nearest piece
    near1 = knn_join(
        a.select("url", "addr_key", "lon", "lat"),
        ex.select("node_id", F.col("e_lon").alias("c_lon"),
                  F.col("e_lat").alias("c_lat")),
        query_id=["url", "addr_key"],
        cand_id="node_id",
        d_max_m=CF.D_MAX_M,
        k=1,
        ring_r=2,
        salt=True,
        hot_threshold=100_000, rows_per_task=50_000,
    ).select("url", "addr_key", F.col("node_id").alias("n_node"),
             F.col("dist_m").alias("n_dist"))
    t("knn_join k=1 (nearest)", near1, 2)

    # full conflate
    out = CF.run_conflate(spark, addrs, buildings, existing, salt=True,
                          pin_inputs=False, hot_threshold=100_000,
                          rows_per_task=50_000)
    t("full conflate_join", out, 2)
    spark.stop()


if __name__ == "__main__":
    main()
