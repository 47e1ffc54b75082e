"""Gates for registry entries without SQL oracles (A3 approx sketch bound,
lang-id sanity) and the entry() smoke the driver performs."""

from pyspark.sql import functions as F

from osm_addr_tools_spark import queries as Q

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    approx = Q.QUERIES["events_user_approx_distinct"](spark, SF_DIR).toPandas()
    exact = (
        Q.load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .toPandas()
    )
    m = approx.merge(exact, on="event_type")
    rel_err = ((m.approx_users - m.exact_users).abs() / m.exact_users).max()
    assert rel_err < 0.05, rel_err


def test_lang_id_plausible_on_documents(spark):
    out = Q.QUERIES["docs_lang_id"](spark, SF_DIR).toPandas()
    assert len(out) == 500
    assert out.lang_pred.isin(["en", "de", "pl", "fr", "und"]).all()


def test_entry_smoke(spark):
    df = Q.entry(spark)
    rows = df.count()
    assert rows > 0
    assert {"url", "addr_key", "match_kind", "matched_ref"} <= set(df.columns)


def test_every_query_has_unique_alias_columns(spark):
    """Driver hash compare sorts columns by name — duplicates would break it."""
    for name, fn in Q.QUERIES.items():
        df = fn(spark, SF_DIR)
        assert len(df.columns) == len(set(df.columns)), name


def test_oracles_subset_of_queries():
    assert set(Q.ORACLES) <= set(Q.QUERIES)
