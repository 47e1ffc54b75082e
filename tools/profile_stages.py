"""Stage-level breakdown of one conflate evidence branch via the UI REST
API (diagnostic only; UI on, bench config otherwise)."""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_spark_ui(cpus):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.python.daemon.module", "osm_addr_tools_spark.daemon_prewarm")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .appName("profile-stages")
        .getOrCreate()
    )


def rest(path):
    with urllib.request.urlopen(f"http://localhost:4099/api/v1/{path}") as r:
        return json.load(r)


def stages_since(app_id, t0_stage_ids):
    out = []
    for s in rest(f"applications/{app_id}/stages?status=complete"):
        if s["stageId"] in t0_stage_ids:
            continue
        out.append(s)
    return out


def run(label, df, app_id):
    seen = {s["stageId"] for s in rest(f"applications/{app_id}/stages")}
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    ss = stages_since(app_id, seen)
    ss.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"== {label}: wall {wall:.3f}s, {len(ss)} stages")
    for s in ss[:14]:
        name = s["name"].split("\n")[0][:70]
        print(
            f"  id={s['stageId']:4d} tasks={s['numCompleteTasks']:4d} "
            f"runTime={s.get('executorRunTime',0)/1000:7.2f}s "
            f"cpuTime={s.get('executorCpuTime',0)/1e9:7.2f}s "
            f"launch-submit..done  in={s.get('inputBytes',0)>>20}MB "
            f"sr={s.get('shuffleReadBytes',0)>>20}MB "
            f"sw={s.get('shuffleWriteBytes',0)>>20}MB  {name}"
        )
    sys.stdout.flush()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = "/tmp/spark_graft_bench_0.1_100000"
    spark = build_spark_ui(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from pyspark.sql import functions as F

    from osm_addr_tools_spark.plans import conflate as CF
    from osm_addr_tools_spark.operators.joins import knn_join, pip_join

    addrs = spark.read.parquet(f"{base}/addrs").withColumn("geocoded", F.lit(True))
    buildings = spark.read.parquet(f"{base}/buildings")
    existing = spark.read.parquet(f"{base}/existing")
    a = addrs.where(F.col("geocoded")).drop("geocoded")
    ex = CF.keyed_existing(existing)

    # warm
    a.write.format("noop").mode("overwrite").save()
    ex.write.format("noop").mode("overwrite").save()

    near1 = knn_join(
        a.select("url", "addr_key", "lon", "lat"),
        ex.select("node_id", F.col("e_lon").alias("c_lon"),
                  F.col("e_lat").alias("c_lat")),
        query_id=["url", "addr_key"], cand_id="node_id",
        d_max_m=CF.D_MAX_M, k=1, ring_r=2, salt=True,
        hot_threshold=100_000, rows_per_task=50_000,
    )
    run("knn nearest (warm1)", near1, app_id)
    run("knn nearest (warm2)", near1, app_id)

    unaddressed = buildings.where(
        ~F.map_contains_key(F.col("tags"), F.lit("addr:housenumber"))
    ).select("building_id", "rings")
    bb = pip_join(a.select("url", "addr_key", "lon", "lat"), unaddressed,
                  CF.CONTAINMENT_LEVEL, salt=True,
                  hot_threshold=100_000, rows_per_task=50_000)
    best_building = bb.groupBy("url", "addr_key").agg(
        F.min("building_id").alias("b_ref"))
    run("pip containment (warm1)", best_building, app_id)
    run("pip containment (warm2)", best_building, app_id)

    spark.stop()


if __name__ == "__main__":
    main()
