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


def test_percentile_approx_full_accuracy_is_quantile_disc(spark):
    """Pins the engineered-exact rule behind orders_price_quartiles_approx:
    percentile_approx at accuracy INT_MAX returns the exact discrete
    quantile — the smallest element with rank ≥ ceil(p·n) — across group
    sizes and heavy duplicate patterns."""
    import math
    import random

    rng = random.Random(11)
    for n in (1, 2, 3, 5, 8, 40, 173):
        # heavy dups: values drawn from a small alphabet
        vals = sorted(rng.choice(range(7)) for _ in range(n))
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = df.agg(
            F.percentile_approx(
                "v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(2147483647)
            ).alias("p")
        ).first().p
        want = [vals[max(0, math.ceil(p * n) - 1)] for p in (0.25, 0.5, 0.75)]
        assert got == want, (n, got, want)


def test_percentile_approx_production_accuracy_error_bound(spark):
    """The plan you'd run at 10¹² rows: accuracy=1000 must return an
    element within rank error n/accuracy of the exact quantile."""
    import math

    o = Q.load(spark, SF_DIR, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    vals = sorted(r.cents for r in o.collect())
    n = len(vals)
    acc = 1000
    got = o.agg(
        F.percentile_approx("cents", F.lit(0.5), F.lit(acc)).alias("p")
    ).first().p
    exact_rank = math.ceil(0.5 * n) - 1
    lo = vals[max(0, exact_rank - (n // acc) - 1)]
    hi = vals[min(n - 1, exact_rank + (n // acc) + 1)]
    assert lo <= got <= hi


def test_emb_dedup_retention_drops_all_plants(spark):
    """Every planted copy (+1e6 exact, +2e6 half-scaled) must be dropped —
    identical sign bits put copies in the SAME bucket in every band, so
    banding cannot lose these pairs — and every original retained."""
    out = Q.QUERIES["emb_dedup_retention"](spark, SF_DIR).toPandas()
    kept = set(out.vec_id)
    n_orig = Q.load(spark, SF_DIR, "embeddings").count()
    assert all(v < 1_000_000 for v in kept)
    assert len(kept) == n_orig


def test_stratified_sample_rates(spark):
    """Both strata must be present with rates near their targets (en 20%,
    others 60%) — guards against a vacuous gate (e.g. a threshold typo
    keeping everything or nothing)."""
    full = Q.load(spark, SF_DIR, "documents").groupBy("lang").count().toPandas()
    kept = (
        Q.QUERIES["docs_stratified_sample"](spark, SF_DIR)
        .groupBy("lang").count().toPandas()
    )
    f = dict(zip(full.lang, full["count"]))
    k = dict(zip(kept.lang, kept["count"]))
    for lang, n in f.items():
        rate = k.get(lang, 0) / n
        target = 0.2 if lang == "en" else 0.6
        assert abs(rate - target) < 0.15, (lang, rate)


def test_top_terms_rank_is_integer_deterministic(spark):
    """Every emitted (doc, term) must be a genuine top-3 of its doc under
    (tf DESC, df ASC, term ASC) — recomputed independently in pandas."""
    out = Q.QUERIES["docs_top_terms"](spark, SF_DIR).toPandas()
    assert (out.groupby("doc_id").size() <= 3).all()
    import re
    from collections import Counter

    docs = Q.load(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()
    tf = {
        int(r.doc_id): Counter(re.findall(r"[a-z]+", r.text.lower()))
        for r in docs.itertuples()
    }
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    for doc_id, g in out.groupby("doc_id"):
        want = sorted(
            tf[int(doc_id)].items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0])
        )[:3]
        got = sorted(
            zip(g.term, g.tf, g.df),
            key=lambda t: (-t[1], t[2], t[0]),
        )
        assert [(t, c, df[t]) for t, c in want] == [tuple(x) for x in got]
