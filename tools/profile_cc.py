"""Per-action timing of the connected_components driver loop on the
geo_customer_clusters edge set (bench session config). Diagnostic only —
not part of the bench contract."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from osm_addr_tools_spark import queries as Q
    from osm_addr_tools_spark.operators.joins import knn_join

    pts = Q._customer_points(spark, sf_dir)
    pairs = knn_join(
        pts.select(F.col("c_custkey").alias("a_key"), "lon", "lat"),
        pts.select(
            F.col("c_custkey").alias("b_key"),
            F.col("lon").alias("c_lon"),
            F.col("lat").alias("c_lat"),
        ),
        query_id="a_key",
        cand_id="b_key",
        d_max_m=Q._CLUSTER_D_M,
        k=None,
        ring_r=3,
    )
    edges = pairs.where(F.col("a_key") < F.col("b_key")).select("a_key", "b_key")

    # warm the session (UDF workers, codegen)
    edges.write.format("noop").mode("overwrite").save()

    # replicate the CC loop with per-action timing
    t_all = time.perf_counter()
    e = (
        edges.select(F.col("a_key").alias("u"), F.col("b_key").alias("v"))
        .union(edges.select(F.col("b_key").alias("u"), F.col("a_key").alias("v")))
        .distinct()
        .persist()
    )
    labels = None
    rnd = 0
    while True:
        rnd += 1
        t0 = time.perf_counter()
        if labels is None:
            cur = e.groupBy("u").agg(
                F.least(F.col("u"), F.min("v")).alias("lbl")
            )
            cmp = cur.select("u", "lbl", (F.col("lbl") != F.col("u")).alias("_chg"))
        else:
            nbr = (
                e.join(labels.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("_nbr"))
            )
            new = labels.join(nbr, "u", "left").select(
                "u", F.least("lbl", "_nbr").alias("lbl")
            )
            cur = new.join(
                labels.select(F.col("u").alias("lbl"), F.col("lbl").alias("_lbl2")),
                "lbl",
            ).select("u", F.least("lbl", "_lbl2").alias("lbl"))
            cmp = cur.join(labels.withColumnRenamed("lbl", "_old"), "u").select(
                "u", "lbl", (F.col("lbl") != F.col("_old")).alias("_chg")
            )
        ck = cmp.localCheckpoint()
        t1 = time.perf_counter()
        labels = ck.select("u", "lbl")
        changed = ck.where(F.col("_chg")).count()
        t2 = time.perf_counter()
        print(
            f"round {rnd}: checkpoint {t1-t0:6.3f}s  count {t2-t1:6.3f}s  "
            f"changed={changed}",
            flush=True,
        )
        if changed == 0:
            break
    print(f"total CC wall {time.perf_counter()-t_all:.3f}s rounds={rnd}")
    spark.stop()


if __name__ == "__main__":
    main()
