"""A/B: connected_components pointer-jump variants on the
geo_customer_clusters edge set (diagnostic only).

Variants, per round after the closed-neighborhood min:
  A (shipped): one jump through the PREVIOUS round's label table
  B: one jump through the freshly-computed table
  C: two jumps through the freshly-computed table
Prints rounds + wall per variant and verifies all label tables agree.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def cc_variant(e, spark, variant, max_iter=25):
    from pyspark.sql import functions as F

    e = e.persist()
    rounds = 0
    labels = None
    t0 = time.perf_counter()
    while True:
        if rounds >= max_iter:
            raise RuntimeError("no converge")
        if labels is None:
            cur = e.groupBy("u").agg(
                F.least(F.col("u"), F.min("v")).alias("lbl")
            )
            if variant in ("B", "C"):
                # jump(s) through the fresh table
                for _ in range(1 if variant == "B" else 2):
                    cur = cur.join(
                        cur.select(
                            F.col("u").alias("lbl"), F.col("lbl").alias("_l2")
                        ),
                        "lbl",
                    ).select("u", F.least("lbl", "_l2").alias("lbl"))
        else:
            prev = labels
            nbr = (
                e.join(prev.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("_nbr"))
            )
            cur = prev.join(nbr, "u", "left").select(
                "u", F.least("lbl", "_nbr").alias("lbl")
            )
            if variant == "A":
                cur = cur.join(
                    prev.select(F.col("u").alias("lbl"), F.col("lbl").alias("_l2")),
                    "lbl",
                ).select("u", F.least("lbl", "_l2").alias("lbl"))
            else:
                for _ in range(1 if variant == "B" else 2):
                    cur = cur.join(
                        cur.select(
                            F.col("u").alias("lbl"), F.col("lbl").alias("_l2")
                        ),
                        "lbl",
                    ).select("u", F.least("lbl", "_l2").alias("lbl"))
        if labels is None:
            cmp = cur.select("u", "lbl", (F.col("lbl") != F.col("u")).alias("_chg"))
        else:
            cmp = (
                cur.join(labels.withColumnRenamed("lbl", "_old"), "u")
                .select("u", "lbl", (F.col("lbl") != F.col("_old")).alias("_chg"))
            )
        ck = cmp.localCheckpoint()
        labels = ck.select("u", "lbl")
        rounds += 1
        if ck.where(F.col("_chg")).count() == 0:
            break
    wall = time.perf_counter() - t0
    e.unpersist()
    return labels, rounds, wall


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
    edges_raw = pairs.where(F.col("a_key") < F.col("b_key")).select("a_key", "b_key")
    # symmetrize once, write to parquet so every variant starts from the
    # same cheap scan (isolates the loop cost from the knn pair build)
    e0 = (
        edges_raw.select(F.col("a_key").alias("u"), F.col("b_key").alias("v"))
        .union(edges_raw.select(F.col("b_key").alias("u"), F.col("a_key").alias("v")))
        .distinct()
    )
    path = "/tmp/cc_jump_edges"
    e0.write.mode("overwrite").parquet(path)
    e = spark.read.parquet(path)
    print("edges:", e.count(), flush=True)

    results = {}
    for _ in range(2):
        for variant in ("A", "B", "C"):
            labels, rounds, wall = cc_variant(e, spark, variant)
            prevbest = results.get(variant)
            if prevbest is None or wall < prevbest[1]:
                results[variant] = (rounds, wall, labels)
            print(f"variant {variant}: rounds={rounds} wall={wall:.3f}s", flush=True)

    la = results["A"][2]
    for variant in ("B", "C"):
        lv = results[variant][2]
        d = la.exceptAll(lv).count() + lv.exceptAll(la).count()
        print(f"labels A vs {variant}: exceptAll diffs = {d}", flush=True)


if __name__ == "__main__":
    main()
