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


def test_lang_id_oracle_asserts_ascii_precondition():
    """Non-ASCII documents must fail oracle generation loudly, not silently
    rot the docs_lang_id parity (VERDICT r2 #6)."""
    import pandas as pd
    import pytest

    from osm_addr_tools_spark import oracle_support as OS

    ok = pd.DataFrame({"doc_id": [1, 2], "text": ["plain ascii", "more text"]})
    OS._assert_ascii_docs(ok)  # no raise
    bad = pd.DataFrame({"doc_id": [1, 2], "text": ["fine", "ulica Długa 7"]})
    with pytest.raises(AssertionError, match="ASCII-only"):
        OS._assert_ascii_docs(bad)


def test_oracle_ensure_atomic_and_idempotent(tmp_path, monkeypatch):
    """ensure() must generate into a temp dir and atomically publish; a
    second call must be a no-op returning the same directory."""
    import os

    from osm_addr_tools_spark import oracle_support as OS

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_BASE", str(tmp_path / "oracle"))
    d1 = OS.ensure("/root/testdata/sf0.001")
    assert os.path.exists(os.path.join(d1, f"_done_v{OS._VERSION}"))
    assert not any(p.name.endswith(f".tmp.{os.getpid()}") for p in tmp_path.iterdir())
    mtime = os.path.getmtime(os.path.join(d1, "extracted.parquet"))
    d2 = OS.ensure("/root/testdata/sf0.001")
    assert d2 == d1
    assert os.path.getmtime(os.path.join(d1, "extracted.parquet")) == mtime
