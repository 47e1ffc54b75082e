"""Stage-level breakdown of the FULL run_conflate (bench-shaped inputs,
UI REST attribution). Diagnostic only."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_stages import build_spark_ui, run  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = "/tmp/spark_graft_bench_0.1_100000"
    sys.path.insert(0, "/root/repo/tools")
    spark = build_spark_ui(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from pyspark.sql import functions as F

    from osm_addr_tools_spark.operators.dedup import release_persisted_fp
    from osm_addr_tools_spark.plans import conflate as CF

    addrs = spark.read.parquet(f"{base}/addrs").withColumn("geocoded", F.lit(True))
    buildings = spark.read.parquet(f"{base}/buildings")
    existing = spark.read.parquet(f"{base}/existing")

    for i in range(3):
        out = CF.run_conflate(spark, addrs, buildings, existing, salt=True,
                              hot_threshold=100_000, rows_per_task=50_000)
        run(f"full run_conflate #{i}", out, app_id)
        release_persisted_fp()

    spark.stop()


if __name__ == "__main__":
    main()
