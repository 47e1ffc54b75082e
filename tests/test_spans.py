"""duplicated_spans (operators/spans.py) — exact substring-span dedup
(Lee et al. 2022 ExactSubstr, distributed k-gram re-expression): goldens
pinning the gaps-and-islands merge, a brute-force pure-Python reference
on a randomized word-soup corpus, and parallelism invariance."""

import random
import re

import pytest
from pyspark.sql import functions as F

from osm_addr_tools_spark.operators.spans import duplicated_spans

K = 4


def _spans_py(docs: dict[int, str], k: int = K, min_count: int = 2):
    """Brute-force reference: exact bigint-free Python, same tokenizer."""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs.items()}
    counts: dict[str, int] = {}
    grams: dict[int, list[tuple[int, str]]] = {}
    for d, ts in toks.items():
        grams[d] = []
        for i in range(len(ts) - k + 1):
            g = " ".join(ts[i : i + k])
            grams[d].append((i, g))
            counts[g] = counts.get(g, 0) + 1
    out = []
    for d, gs in grams.items():
        hits = sorted(i for i, g in gs if counts[g] >= min_count)
        cur = None
        for i in hits:
            s, e = i, i + k
            if cur and s <= cur[1]:
                cur[1] = max(cur[1], e)
                cur[2] += 1
            else:
                if cur:
                    out.append((d, cur[0], cur[1], cur[2]))
                cur = [s, e, 1]
        if cur:
            out.append((d, cur[0], cur[1], cur[2]))
    return sorted(out)


def _run(spark, docs: dict[int, str], k: int = K, parts: int = 4):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    ).repartition(parts)
    return sorted(
        tuple(r)
        for r in duplicated_spans(df, k=k).select(
            "doc_id", "span_start", "span_end", "n_grams"
        ).collect()
    )


def test_golden_cross_doc_and_merge(spark):
    # docs 1 and 2 share "a b c d e" (5 tokens → two dup 4-gram windows
    # overlapping → ONE merged span of 5 tokens); doc 3 is clean.
    docs = {
        1: "x1 y1 a b c d e z1",
        2: "x2 a b c d e",
        3: "q r s t u v w",
    }
    assert _run(spark, docs) == [(1, 2, 7, 2), (2, 1, 6, 2)]


def test_golden_intra_doc_repeat_merges_across_copies(spark):
    # "p q r s" twice in ONE doc: dup windows [0,4) and [4,8) touch and
    # must merge into a single [0,8) span — and nothing else is dup.
    docs = {1: "p q r s p q r s", 2: "entirely different words here now"}
    assert _run(spark, docs) == [(1, 0, 8, 2)]


def test_golden_touching_vs_gapped_islands(spark):
    # doc 1 repeats "a b c d" at positions 0 and 6 with a unique gap —
    # two SEPARATE spans; within-doc counting, no other doc involved.
    docs = {1: "a b c d gapword unique1 a b c d", 2: "w x y z unrelated"}
    assert _run(spark, docs) == [(1, 0, 4, 1), (1, 6, 10, 1)]


def test_short_docs_emit_nothing(spark):
    docs = {1: "one two three", 2: "one two three"}  # < K tokens
    assert _run(spark, docs) == []


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        duplicated_spans(df, k=1)


def test_matches_bruteforce_on_random_corpus(spark):
    # word-soup with a SMALL vocab so natural dup 4-grams actually occur,
    # plus planted shared sentences — the reference is exact Python.
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(9)]
    plant = "alpha beta gamma delta epsilon"
    docs = {}
    for d in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(2, 30))]
        if d % 7 == 3:
            pos = rng.randint(0, len(words))
            words[pos:pos] = plant.split()
        docs[d] = " ".join(words)
    assert _run(spark, docs) == _spans_py(docs)


def test_parallelism_invariance(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(8)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 25)))
        for d in range(40)
    }
    assert _run(spark, docs, parts=2) == _run(spark, docs, parts=16)


def test_spans_disjoint_and_min_length(spark):
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(6)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 40)))
        for d in range(50)
    }
    rows = _run(spark, docs)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e, n in rows:
        assert e - s >= K
        assert n >= 1
        by_doc.setdefault(d, []).append((s, e))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # strictly separated: touching spans merge


# --- apply_span_removals (the rewrite step, VERDICT r6 missing #2) ----------


def test_apply_span_removals_goldens(spark):
    """Boundary goldens: adjacent spans merge their cuts, span-at-end,
    whole-doc span -> empty string (doc never dropped), worklist-free doc
    passes through with n_removed = 0, and coordinates are in the
    normalized (lowercase TOKEN_RE) token space."""
    from osm_addr_tools_spark.operators.spans import apply_span_removals

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "Keep, ALL of this!"),
            (3, "q r s t"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [
            (1, 1, 3), (1, 3, 5), (1, 7, 8),  # adjacent cuts + span-at-end
            (3, 0, 4),                          # whole-doc span
        ],
        "doc_id long, span_start long, span_end long",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in apply_span_removals(docs, spans).collect()
    }
    assert got == {
        1: ("a f g", 5),
        2: ("keep all of this", 0),
        3: ("", 4),
        4: ("", 0),
    }


def test_apply_span_removals_roundtrip_with_duplicated_spans(spark):
    """End-to-end: after applying duplicated_spans' own worklist, NO
    duplicated k-gram may survive anywhere in the rewritten corpus (the
    fixed point of ExactSubstr: every dup span got cut)."""
    from osm_addr_tools_spark.operators.spans import apply_span_removals

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta unique one"),
            (2, "alpha beta gamma delta epsilon zeta eta theta unique two"),
            (3, "self copy self copy self copy self copy tail"),
            (4, "completely independent document with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, k=K)
    clean = apply_span_removals(docs, spans).withColumnRenamed(
        "clean_text", "text"
    )
    assert duplicated_spans(clean.select("doc_id", "text"), k=K).count() == 0
    untouched = {
        r.doc_id: r.n_removed
        for r in apply_span_removals(docs, spans).collect()
    }
    assert untouched[4] == 0


def test_apply_span_removals_null_and_empty_text(spark):
    """Pass-through contract survives NULL/empty text: one row per doc,
    clean_text = '' (never NULL), n_removed = 0 — a NULL would otherwise
    propagate through regexp_extract_all → filter → array_join and feed
    NULLs to downstream length/quality filters."""
    from osm_addr_tools_spark.operators.spans import apply_span_removals

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "keep these words")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long"
    )
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in apply_span_removals(docs, spans).collect()}
    assert got == {1: ("", 0), 2: ("", 0), 3: ("keep these words", 0)}
