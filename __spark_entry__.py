"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``osm_addr_tools_spark.queries``; this module is
the thin stable shim the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_addr_tools_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so a
    driver cap on entries-per-round drops only deliberately-redundant
    second gates (queries.ordered_queries)."""
    return Q.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query.

    Pipeline-tail oracles read pure-pandas intermediates materialized to
    /tmp (osm_addr_tools_spark.oracle_support) — generated here, without a
    SparkSession, so they exist whichever side the driver runs first. The
    few genuinely non-SQL-expressible entries (sketches with engine-specific
    estimators, media plumbing, lang-id) stay rows-only."""
    from osm_addr_tools_spark import oracle_support as OS

    OS.ensure("/root/testdata/sf0.01")  # the driver's correctness scale
    return dict(Q.ORACLES)
