"""A/B: fuzzy_best top-1 pick — row_number window vs min_by argmax
(diagnostic only; bench session config, stored parquet inputs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def t(label, df, n=3):
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

    addrs = spark.read.parquet(f"{base}/addrs").withColumn("geocoded", F.lit(True))
    existing = spark.read.parquet(f"{base}/existing")
    a = addrs.where(F.col("geocoded")).drop("geocoded")
    ex = CF.keyed_existing(existing)

    tau = CF.FUZZY_TAU
    va = a.select("city_norm", F.col("street_norm").alias("_a_street")).distinct()
    ve = ex.select("city_norm", F.col("street_norm").alias("_e_street")).distinct()
    la, lb = F.length("_a_street"), F.length("_e_street")
    pair_ratio = (
        va.join(ve, "city_norm")
        .where(F.col("_e_street") != F.col("_a_street"))
        .select("_a_street", "_e_street")
        .distinct()
        .where(2.0 * F.least(la, lb) >= F.lit(float(tau)) * (la + lb))
        .withColumn(
            "_ratio",
            CF.street_similarity_udf(float(tau))(
                F.col("_a_street"), F.col("_e_street")
            ),
        )
        .where(F.col("_ratio") >= F.lit(float(tau)))
    )
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
        F.col("_ratio").desc(), F.col("f_node").asc()
    )
    fb_window = (
        f_cand.withColumn("_rn", F.row_number().over(w_fuzzy))
        .where(F.col("_rn") == 1)
        .select("url", "addr_key", "f_node", "f_has_pc", "f_lon", "f_lat", "f_tags")
    )

    ordc = F.struct((-F.col("_ratio")).alias("_nr"), F.col("f_node").alias("_fn"))
    fc = f_cand.withColumn("_ord", ordc)
    fb_agg = fc.groupBy("url", "addr_key").agg(
        F.min_by("f_node", "_ord").alias("f_node"),
        F.min_by("f_has_pc", "_ord").alias("f_has_pc"),
        F.min_by("f_lon", "_ord").alias("f_lon"),
        F.min_by("f_lat", "_ord").alias("f_lat"),
        F.min_by("f_tags", "_ord").alias("f_tags"),
    )

    # candidate volume for context
    print("f_cand rows:", f_cand.count(), flush=True)

    t("warm (window)", fb_window, 1)
    for _ in range(2):
        t("fuzzy_best window", fb_window, 3)
        t("fuzzy_best min_by", fb_agg, 3)

    # row-identity check (order-insensitive)
    aw = fb_window.withColumn("f_tags_s", F.to_json("f_tags")).drop("f_tags")
    ag = fb_agg.withColumn("f_tags_s", F.to_json("f_tags")).drop("f_tags")
    d1 = aw.exceptAll(ag).count()
    d2 = ag.exceptAll(aw).count()
    print("exceptAll diffs:", d1, d2, flush=True)


if __name__ == "__main__":
    main()
