"""Structured Streaming ingest (SURVEY.md §2.10, optional phase).

The batch engine is the deliverable; this module proves the schema and
operator choices don't preclude streaming: the same pages schema streams
from a file source (Iceberg streaming read in production), with an
event-time watermark on ``warc_ts``, stateful url-dedupe, windowed per-lang
counts, and the SAME X1/X2 extraction kernels applied to the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_addr_tools_spark.sources.synth import PAGES_DDL


def read_pages_stream(
    spark: SparkSession, path: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming read of a pages directory (file source stands in for the
    Iceberg streaming read; schema is fixed — no inference on streams)."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .parquet(path)
        .withWatermark("warc_ts", watermark)
    )


def dedupe_recrawls_stream(pages: DataFrame) -> DataFrame:
    """Stateful url-dedupe within the watermark (first crawl wins; late
    re-crawls beyond the watermark are dropped by the engine)."""
    return pages.dropDuplicatesWithinWatermark(["url"])


def windowed_lang_counts(pages: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts per lang (append-mode capable)."""
    return pages.groupBy(F.window("warc_ts", window), "lang").agg(
        F.count(F.lit(1)).alias("n_pages")
    )


def extract_stream(pages: DataFrame) -> DataFrame:
    """EP1's X1+X2 stages applied to the stream (same kernels, same
    fused-UDF shape — batch/stream parity by construction)."""
    from osm_addr_tools_spark.plans.extract import (
        extract_text_udf,
        parse_and_normalize_udf,
    )

    df = pages.select("url", "warc_ts", "html")
    df = df.withColumn("text", extract_text_udf()("html")).drop("html")
    df = df.withColumn("addr", F.explode(parse_and_normalize_udf()("text"))).drop("text")
    return df.select("url", "warc_ts", "addr.*")


def run_to_memory(spark: SparkSession, df: DataFrame, name: str, mode: str = "append"):
    """availableNow trigger into a memory sink (test/debug harness).
    Windowed aggregations need mode="complete" to surface windows the
    watermark hasn't closed yet."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
