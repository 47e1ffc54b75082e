"""Hashed linear quality classifier — the fastText-style "model-based
quality filtering" pass of a web-text pipeline (GPT-3 / CCNet / FineWeb
all gate documents on a cheap linear classifier over hashed token
features; Weinberger et al. 2009's feature-hashing trick is what makes
the feature space fixed-size with no vocabulary to ship).

Scoring a document is ``score = Σ_t w[h(t)] / (|tokens| * W)`` — hash
every token into one of ``dim`` buckets, sum the bucket weights, and
normalize. Two interchangeable execution paths:

* ``hashed_score`` — pure Column expressions (split → aggregate lambda →
  one division), fully inside whole-stage codegen: ZERO shuffles, zero
  joins, zero Python — quality filtering at scan speed. Weights are
  derived arithmetically from the bucket id (below), which is what keeps
  this path engine-portable for the DuckDB oracle gate.
* ``hashed_score_pandas`` — the PRODUCTION shape for a real trained
  model: an Arrow-batched pandas UDF closing over a numpy weight vector
  of any ``dim`` (a learned w would be broadcast to executors inside the
  serialized UDF — still zero shuffles). Pytest pins both paths to
  identical outputs on the derived weights.

Engine-parity constraints (same reasoning as operators/sampling.py —
the oracle must reproduce every bit):

* the TOKEN HASH is a bounded character-probe polynomial —
  ``L*131 + 17*cp(first) + 7*cp(last) + cp(middle)`` with L capped at
  10 000 (caps the int64 product below; also bounds work on pathological
  unbroken-text tokens) — because Spark's xxhash64/md5 and DuckDB's hash()
  disagree. Swapping in xxhash64 for production is this one expression;
  the plan shape does not change. Collisions only fold features together
  — that is the feature-hashing trick working as designed, not an error.
* the WEIGHT of bucket b is ``(b * 2654435761) mod 2^32 mod 1001 - 500``
  — an integer in [-500, 500], a deterministic stand-in for trained
  weights with the same plan shape. Per-document sums therefore stay in
  EXACT int64 (order-free); the only float op is one final division.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_addr_tools_spark.operators.sampling import FIB_MULT, _MOD32

W_SCALE = 500  # weights live in [-W_SCALE, W_SCALE]
MAX_TOKEN_LEN = 10_000  # probe-length cap: bounds probe*FIB_MULT « 2^63

# PII scan patterns (queries.docs_pii_scan + streaming filter-at-ingest):
# only syntax Java regex and RE2 interpret identically — explicit classes,
# bounded repeats, no lookaround, no \b
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def _token_probe(t: Column) -> Column:
    """Bounded character-probe hash of one token (int64 Column)."""
    length = F.least(F.length(t), F.lit(MAX_TOKEN_LEN))
    mid = ((length + 1) - (length + 1) % 2) / 2  # (L+1) div 2, exact small ints
    probe = (
        length * 131
        + F.ascii(F.substr(t, F.lit(1), F.lit(1))) * 17
        + F.ascii(F.substr(t, length, F.lit(1))) * 7
        + F.ascii(F.substr(t, mid.cast("int"), F.lit(1)))
    )
    return F.when(length == 0, F.lit(0)).otherwise(probe).cast("long")


def bucket_expr(t: Column, dim: int) -> Column:
    """Feature bucket of one token: (probe * FIB) mod 2^32 mod dim."""
    return (_token_probe(t) * F.lit(FIB_MULT)) % F.lit(_MOD32) % F.lit(dim)


def weight_expr(bucket: Column) -> Column:
    """Derived integer weight in [-W_SCALE, W_SCALE] for a bucket id."""
    return (bucket * F.lit(FIB_MULT)) % F.lit(_MOD32) % F.lit(2 * W_SCALE + 1) - F.lit(
        W_SCALE
    )


def score_cols(text_col: str, dim: int) -> tuple[Column, Column]:
    """(n_tok, score_num) Column pair for a text column — the classifier
    core as composable expressions (used by hashed_score and the
    streaming filter-at-ingest stage, which must keep other columns)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    score_num = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + weight_expr(bucket_expr(t, dim)),
    )
    return F.size(toks).cast("long"), score_num


def hashed_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 20,
) -> DataFrame:
    """Score every document with the hashed linear classifier — pure
    Column path (see module doc). Output: (id_col, n_tok, score_num,
    score, keep) where score_num is the EXACT int64 weight sum (the
    hash-gate anchor), score = score_num / (n_tok * W_SCALE) ∈ [-1, 1]
    is a single division, and keep = score ≥ 0 (a trained threshold
    replaces 0 in production)."""
    n_tok, score_num = score_cols(text_col, dim)
    d = df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        score_num.alias("score_num"),
    )
    score = F.col("score_num") / (F.col("n_tok") * F.lit(float(W_SCALE)))
    return d.select(
        id_col,
        "n_tok",
        "score_num",
        score.alias("score"),
        (score >= 0.0).alias("keep"),
    )


# --- production path: numpy weight vector inside an Arrow-batched UDF ------

_WS = re.compile(r"\s+")


def derived_weights(dim: int) -> np.ndarray:
    """The weight vector the Column path encodes arithmetically —
    w[b] = (b * FIB) mod 2^32 mod (2W+1) - W, as int64."""
    b = np.arange(dim, dtype=np.uint64)
    return (
        (b * np.uint64(FIB_MULT)) % np.uint64(_MOD32) % np.uint64(2 * W_SCALE + 1)
    ).astype(np.int64) - W_SCALE


def _probe_py(t: str) -> int:
    if not t:
        return 0
    length = min(len(t), MAX_TOKEN_LEN)
    mid = (length + 1) // 2
    return length * 131 + ord(t[0]) * 17 + ord(t[length - 1]) * 7 + ord(t[mid - 1])


def score_batch(text: pd.Series, weights: np.ndarray) -> pd.DataFrame:
    """Batch kernel: per-doc (n_tok, score_num) with an arbitrary weight
    vector (len(weights) = dim). Pure function, reused by pytest as the
    reference for the Column path."""
    dim = len(weights)
    n_tok, score_num = [], []
    for doc in text.fillna(""):
        toks = _WS.split(doc.strip().lower())
        n_tok.append(len(toks))
        s = 0
        for t in toks:
            s += int(weights[(_probe_py(t) * FIB_MULT) % _MOD32 % dim])
        score_num.append(s)
    return pd.DataFrame({"n_tok": n_tok, "score_num": score_num})


def hashed_score_pandas(
    df: DataFrame,
    weights: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Production path: score with a REAL weight vector (trained or
    derived) shipped to executors inside the serialized UDF closure —
    Arrow-batched, zero shuffles, same output contract as hashed_score."""
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(weights, dtype=np.int64)

    @pandas_udf("struct<n_tok:long,score_num:long>")
    def sc(t: pd.Series) -> pd.DataFrame:
        return score_batch(t, w)

    # optimizer fence: the field extractions below otherwise collapse
    # into repeated evaluations of the scoring kernel (guide §4.4)
    sc = sc.asNondeterministic()

    d = df.select(F.col(id_col), sc(F.col(text_col)).alias("_s"))
    score = F.col("_s.score_num") / (F.col("_s.n_tok") * F.lit(float(W_SCALE)))
    return d.select(
        id_col,
        F.col("_s.n_tok").alias("n_tok"),
        F.col("_s.score_num").alias("score_num"),
        score.alias("score"),
        (score >= 0.0).alias("keep"),
    )
