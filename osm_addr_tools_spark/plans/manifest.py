"""S5 — checkpoint manifest: per-partition lineage + metrics, resumable
writes (SURVEY.md §2.1 S5, §2.4 J6b; BASELINE north_star: "every partition
writes lineage + row-count/match-rate metrics to a checkpoint manifest so a
killed job resumes without recomputation").

Design (deliberately NOT Spark ``checkpoint()`` — RDD truncation is not
resumable across driver restarts):

* stage output is written ``partitionBy(part_col)`` with dynamic partition
  overwrite — a re-run of a partition atomically replaces its directory;
* the manifest (``<out>/_manifest`` parquet, leading underscore so data
  readers ignore it) is appended ONLY after a write job succeeds, one row
  per completed partition key: (stage, config_hash, part value, rows,
  metric columns, wall_ms);
* resume = anti-join of the input's partition keys against the manifest
  keys for (stage, config_hash) — completed partitions are never
  recomputed; a config change (different config_hash) invalidates resume.

Crash window: if the job dies between the data write and the manifest
append, the partitions are rewritten on resume (identical bytes — the
pipeline is deterministic), i.e. at-least-once with idempotent overwrite.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"

_MANIFEST_SCHEMA = (
    "stage string, config_hash string, part long, rows long, "
    "matched long, wall_ms long"
)


def config_hash(conf: dict) -> str:
    return hashlib.sha256(
        json.dumps(conf, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, MANIFEST_DIR)
    try:
        return spark.read.schema(_MANIFEST_SCHEMA).parquet(path)
    except AnalysisException as e:
        # absent manifest (fresh job) → None; anything else (storage
        # errors, corruption) raises — treating it as "no manifest" would
        # silently re-run every completed partition of a 100 TB job
        if "PATH_NOT_FOUND" not in str(e):
            raise
        return None


def completed_parts(
    spark: SparkSession, out_dir: str, stage: str, cfg_hash: str
) -> DataFrame | None:
    m = read_manifest(spark, out_dir)
    if m is None:
        return None
    return (
        m.where((F.col("stage") == stage) & (F.col("config_hash") == cfg_hash))
        .select("part")
        .distinct()
    )


def write_resumable(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    stage: str,
    conf: dict,
    part_col: str = "cell_p",
    matched_pred=None,
) -> dict:
    """Write ``df`` partitioned by ``part_col``, skipping partitions already
    recorded in the manifest for (stage, config_hash(conf)).

    Returns {"planned": n, "skipped": n, "written": n, "rows": n}.
    ``matched_pred``: optional Column → per-partition ``matched`` count
    (match-rate metric in the manifest).
    """
    cfg = config_hash(conf)
    done = completed_parts(spark, out_dir, stage, cfg)
    if done is not None:
        done_keys = [r.part for r in done.collect()]  # small: partition keys only
    else:
        done_keys = []

    planned = [r.part for r in df.select(F.col(part_col).alias("part")).distinct().collect()]
    todo = sorted(set(planned) - set(done_keys))
    stats = {
        "planned": len(planned),
        "skipped": len(planned) - len(todo),
        "written": len(todo),
        "rows": 0,
    }
    if not todo:
        return stats

    work = df.where(F.col(part_col).isin(todo))
    t0 = time.perf_counter()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        work.write.partitionBy(part_col).mode("overwrite").parquet(out_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    wall_ms = int((time.perf_counter() - t0) * 1000)

    matched_expr = (
        F.sum(F.when(matched_pred, 1).otherwise(0))
        if matched_pred is not None
        else F.lit(0)
    )
    metrics = (
        work.groupBy(F.col(part_col).alias("part"))
        .agg(F.count(F.lit(1)).alias("rows"), matched_expr.cast("long").alias("matched"))
        .withColumn("stage", F.lit(stage))
        .withColumn("config_hash", F.lit(cfg))
        .withColumn("wall_ms", F.lit(wall_ms))
        .select("stage", "config_hash", "part", "rows", "matched", "wall_ms")
    )
    metrics.write.mode("append").parquet(os.path.join(out_dir, MANIFEST_DIR))
    stats["rows"] = work.count()
    return stats


def with_part_col(
    df: DataFrame, level: int = 6, lon: str = "lon", lat: str = "lat",
    out: str = "cell_p",
) -> DataFrame:
    """Standard physical partition column: coarse cell of the row's point
    (SURVEY §4: sink partitioned by cell prefix → partition pruning on
    reads, locality for downstream cell joins)."""
    from osm_addr_tools_spark.operators.joins import cell_encode_udf

    return df.withColumn(out, cell_encode_udf(level)(F.col(lon), F.col(lat)))


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
