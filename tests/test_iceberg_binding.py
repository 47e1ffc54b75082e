"""S1 production binding: the ``table:<name>`` pages source against a real
Iceberg catalog. The sandbox ships no Iceberg jar, so this whole module is
``skipif``-gated on the SparkCatalog class being loadable — it collects and
SKIPS here, and runs for real the day the jar is present (launch it via
tools/submit_iceberg.sh, which carries the exact --packages line).
VERDICT r2 #7."""

import pytest


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 — Py4J raises a wrapped ClassNotFound
        return False


def test_pages_roundtrip_via_iceberg_table(spark, tmp_path):
    if not _iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar on the classpath "
                    "(see tools/submit_iceberg.sh)")
    from pyspark.sql import functions as F

    from osm_addr_tools_spark.sources import synth as S
    from osm_addr_tools_spark.sources.io import PAGES_COLUMNS, read_pages

    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
    pages = S.synth_pages(spark, 200)
    pages.writeTo("ice.db.pages").using("iceberg").createOrReplace()
    got = read_pages(spark, "table:ice.db.pages")
    assert got.columns == PAGES_COLUMNS
    assert got.count() == pages.count()
    # byte-identity per url survives the catalog round-trip
    a = pages.select("url", F.md5("text").alias("h"))
    b = got.select("url", F.md5("text").alias("h2"))
    assert a.join(b, "url").where("h <> h2").count() == 0
