"""Dump .explain("formatted") for every query the r8 optimization round
touched, to plans/r08/<query>_<suffix>.txt.

Usage: python tools/gen_r08_plans.py <repo_root> <out_dir> <suffix>

Run once against a worktree at the round-start commit (suffix=before) and
once against HEAD (suffix=after). The session mirrors bench.py's config so
the plans match what the bench executes.
"""

import os
import sys

repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo_root)

from bench import bench_queries, build_spark  # noqa: E402

TOUCHED = [
    "conflate_join",
    "conflate_pipeline",
    "extract_only",
    "tile_polygons",
    "geo_knn_nearest_supplier",
    "geo_distance_band_count",
    "geo_customer_clusters",
    "dedup_minhash_components",
    "emb_dedup_retention",
    "docs_incremental_dedup",
    "docs_winnow_partial_dups",
    "emb_ann_lsh_top3",
    "docs_shuffle_order",
    "docs_training_manifest",
]


def main():
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    base = "/tmp/spark_graft_bench_0.1_100000"
    qs = bench_queries(spark, sf_dir, 100_000, base)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in TOUCHED:
        try:
            df = qs[name]()
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building {name}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print("wrote", name, suffix, flush=True)
        from osm_addr_tools_spark.operators.dedup import release_persisted_fp

        release_persisted_fp()
    spark.stop()


if __name__ == "__main__":
    main()
