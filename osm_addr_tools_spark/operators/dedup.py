"""Deduplication operator family for training-data pipelines over the
``documents`` table (driver mandate: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup — each a first-class engine component).

Scale design (the part that matters at 10^12 docs):

* exact: hash-groupBy — one shuffle on a 16-byte key, partial-agg combined.
* n-gram Jaccard: the *exact* similarity join is expressed entirely as
  DataFrame ops — explode(shingle hashes) → self-equi-join on the shingle →
  per-pair intersection counts vs per-doc counts. No per-pair Python; the
  shuffle key is the shingle hash, so common-shingle skew is the classic
  hot-key problem (stop-shingle cap below bounds it).
* MinHash+LSH: signatures in one Arrow-batched UDF; banding turns the
  similarity join into |bands| equi-joins on (band, bucket) — sub-linear
  candidate generation; verification on signature agreement is a cheap
  Column expression over aligned arrays.
* SimHash: 64-bit fingerprint; pigeonhole banding (4×16-bit chunks) makes
  hamming≤3 candidate generation an equi-join too.

All hashes are splitmix64-derived from md5 bytes — deterministic across
processes (never Python ``hash``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from osm_addr_tools_spark.functions.text import _WORD_RE

# ---------------------------------------------------------------------------
# deterministic hashing helpers
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of word k-shingles (md5-based, deterministic)."""
    words = [w.lower() for w in _WORD_RE.findall(text or "")]
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
            for g in set(grams)
        ),
        dtype=np.uint64,
    )
    return out


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n, keep_doc=min id)."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n"), F.min(id_col).alias("keep_doc"))
        .where(F.col("n") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each identical-text group."""
    w_hash = F.md5(F.col(text_col).cast("binary"))
    from pyspark.sql import Window

    w = Window.partitionBy(w_hash).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (DataFrame-native)
# ---------------------------------------------------------------------------


def shingle_udf(k: int, max_shingles: int = 512):
    """doc text → array of distinct shingle hashes (sorted; capped for
    bounded row width — cap is recorded by the caller via log/metrics)."""

    @pandas_udf("array<long>")
    def sh(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            h = np.sort(_shingle_hashes(t, k))[:max_shingles]
            out.append(h.astype(np.int64).tolist())
        return pd.Series(out)

    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    stop_shingle_df: int = 1000,
) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b, jaccard ≥ threshold).

    explode(shingles) → self-join on shingle → |A∩B| per pair → exact
    jaccard from per-doc shingle counts. ``stop_shingle_df`` drops shingles
    appearing in more rows than the cap (boilerplate n-grams — the hot-key
    guard; a pair sharing ONLY stop shingles is below any useful threshold
    anyway at that document frequency).
    """
    sh = df.select(
        F.col(id_col).alias("_id"), shingle_udf(k)(F.col(text_col)).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    sh = sh.where(F.col("_n") > 0)
    ex = sh.select("_id", "_n", F.explode("_sh").alias("_g"))
    hot = (
        ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > stop_shingle_df)
        .select("_g")
    )
    ex = ex.join(F.broadcast(hot), "_g", "left_anti")
    a = ex.select(F.col("_id").alias("a"), F.col("_n").alias("na"), "_g")
    b = ex.select(F.col("_id").alias("b"), F.col("_n").alias("nb"), "_g")
    inter = (
        a.join(b, "_g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_udf(k: int = 5, num_perm: int = 64, seed: int = 42):
    a, b = _perm_params(num_perm, seed)

    @pandas_udf("array<long>")
    def mh(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            h = _shingle_hashes(t, k)
            if h.size == 0:
                out.append([0] * len(a))
                continue
            # (a*x + b) mod mersenne61, vectorized (num_perm × n_shingles)
            hv = (h % np.uint64(_MERSENNE)).astype(np.uint64)
            sig = np.empty(len(a), dtype=np.int64)
            for i in range(len(a)):
                vals = (a[i] * hv + b[i]) % np.uint64(_MERSENNE)
                sig[i] = np.int64(vals.min())
            out.append(sig.tolist())
        return pd.Series(out)

    return mh


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding (a < b).

    Candidates: equal band-slice hash in ≥1 of ``bands`` bands (equi-join on
    (band, bucket)). Verification: estimated Jaccard = fraction of agreeing
    signature positions ≥ threshold — a Column expression over the aligned
    signature arrays (zip_with), no Python in the verify step.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_udf(k, num_perm, seed)(F.col(text_col)).alias("_sig"),
    )
    band_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.slice("_sig", i * rows_per_band + 1, rows_per_band).cast("string")
                ).alias("bucket"),
            )
            for i in range(bands)
        ]
    )
    buckets = sig.withColumn("_b", F.explode(band_cols)).select(
        "_id", "_sig", F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket")
    )
    lhs = buckets.select(
        F.col("_id").alias("a"), F.col("_sig").alias("sig_a"), "band", "bucket"
    )
    rhs = buckets.select(
        F.col("_id").alias("b"), F.col("_sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        lhs.join(rhs, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .dropDuplicates(["a", "b"])
    )
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = agree / F.lit(num_perm)
    return (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_udf(seed: int = 42):
    @pandas_udf("long")
    def sim(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            words = [w.lower() for w in _WORD_RE.findall(t or "")]
            if not words:
                continue
            uniq, counts = np.unique(np.array(words, dtype=object), return_counts=True)
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    for w in uniq
                ),
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            fp = np.uint64(0)
            for bit in np.flatnonzero(v > 0):
                fp |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return sim


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs with simhash hamming distance ≤ max_hamming (a < b).

    Pigeonhole banding: with 4 16-bit chunks, any pair at distance ≤ 3
    agrees on at least one chunk → candidates via equi-join on (chunk id,
    chunk value); exact popcount filter after.
    """
    fp = df.select(F.col(id_col).alias("_id"), simhash_udf()(F.col(text_col)).alias("_fp"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("_fp"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for i in range(4)
        ]
    )
    b = fp.withColumn("_c", F.explode(chunks)).select(
        "_id", "_fp", F.col("_c.chunk").alias("chunk"), F.col("_c.val").alias("val")
    )
    lhs = b.select(F.col("_id").alias("a"), F.col("_fp").alias("fp_a"), "chunk", "val")
    rhs = b.select(F.col("_id").alias("b"), F.col("_fp").alias("fp_b"), "chunk", "val")
    cand = (
        lhs.join(rhs, ["chunk", "val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "fp_a", "fp_b")
        .dropDuplicates(["a", "b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
