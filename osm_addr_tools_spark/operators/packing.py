"""Length-bucketed sequence packing — deterministic pack/slot assignment
for training batches.

The training-data shape: every example must land in a fixed-capacity
sequence (``capacity`` tokens). Concatenate-and-chunk (``token_shards``)
splits documents across boundaries; padding every doc to ``capacity``
wastes compute proportional to the length spread. The standard middle
ground is LENGTH-BUCKETED packing: round each doc's token count up to a
power-of-two bucket, then pack ``capacity // bucket`` same-bucket docs
per sequence — padding waste is bounded by <2× within a bucket, no doc is
split, and the assignment is a pure function of (bucket, rank-in-bucket),
so it is reproducible and resumable.

Why not ``row_number().over(Window.partitionBy(bucket))``: with ~log2
buckets the whole corpus would run on ~a dozen window tasks. The rank
comes from ``prefix_sum.grouped_row_number`` instead — monotone
order-key buckets, one per-(bucket, group) counts aggregate, bounded
offsets collect, full-parallelism windows.

Scale shape at 100 TB: one scan → JVM CASE ladder for the bucket (no
UDF, inside codegen) → the grouped prefix-sum core (two passes over the
pruned (id, n_tok) projection) → pure Column arithmetic for pack/slot.
No join wider than the broadcast offsets table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_addr_tools_spark.operators.prefix_sum import grouped_row_number


def length_buckets(capacity: int, min_bucket: int) -> list[int]:
    """Ascending power-of-two bucket capacities [min_bucket .. capacity].
    Both ends must be powers of two with min_bucket ≤ capacity."""
    for v, name in ((capacity, "capacity"), (min_bucket, "min_bucket")):
        if v < 1 or v & (v - 1):
            raise ValueError(f"{name} must be a positive power of two; got {v}")
    if min_bucket > capacity:
        raise ValueError(f"min_bucket {min_bucket} > capacity {capacity}")
    out, b = [], min_bucket
    while b <= capacity:
        out.append(b)
        b *= 2
    return out


def pack_by_length_bucket(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    capacity: int = 128,
    min_bucket: int = 8,
) -> DataFrame:
    """Assign every doc a (bucket_cap, pack_id, slot) training position.

    bucket_cap = smallest power-of-two bucket ≥ n_tok (clamped to
    [min_bucket, capacity]); docs with n_tok > capacity are flagged
    ``truncated`` and packed alone at bucket_cap = capacity. Within a
    bucket, docs are ranked by ``id_col`` (deterministic; ties impossible
    on unique ids) and packed ``capacity // bucket_cap`` per pack:
    pack_id = (rank-1) // per_pack, slot = (rank-1) % per_pack. Every
    pack holds docs of ONE bucket, so its token sum ≤ capacity by
    construction.

    Output: id, n_tok, bucket_cap, truncated, pack_id, slot — pack_id is
    unique within a bucket_cap (the pack key is (bucket_cap, pack_id))."""
    buckets = length_buckets(capacity, min_bucket)
    n = F.col(n_tok_col)
    cap = F.lit(capacity)
    for b in reversed(buckets):
        cap = F.when(n <= b, F.lit(b)).otherwise(cap)
    d = df.select(
        id_col,
        F.col(n_tok_col).cast("long").alias(n_tok_col),
        cap.cast("long").alias("bucket_cap"),
        (n > capacity).alias("truncated"),
    )
    # exact int64 arithmetic via SQL `div` — double division would
    # silently lose ulps past 2^53 ranks
    r = (
        grouped_row_number(d, "bucket_cap", id_col, out_col="_rank")
        .withColumn("_pp", F.expr(f"cast({capacity} as bigint) div bucket_cap"))
        .withColumn("_r0", F.col("_rank") - F.lit(1).cast("long"))
    )
    return (
        r.select(
            id_col,
            n_tok_col,
            "bucket_cap",
            "truncated",
            F.expr("_r0 div _pp").cast("long").alias("pack_id"),
            (F.col("_r0") % F.col("_pp")).cast("long").alias("slot"),
        )
    )
