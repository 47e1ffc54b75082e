"""EP2 — conflate: extracted address points × buildings × existing OSM-style
nodes → match decisions (SURVEY.md §3 EP2; the reference family's merge
semantics re-expressed as Catalyst-planned joins).

Match kinds, in precedence order (pinned normative semantics — FIXTURES.md §2;
the pure-Python oracle in tests/oracle.py implements the same rules
independently):

  duplicate  same addr_key exists among existing nodes AND the existing node
             already carries every tag the import would add (i.e. it has
             addr:postcode, or the import has none) → drop, no edit.
  update     same addr_key exists but the import adds addr:postcode →
             emit merged tags (existing ⊕ postcode).
  attach     no key match; point lies inside an UNADDRESSED building
             footprint (no addr:housenumber tag) → attach to the building
             with the smallest id containing it.
  nearest    no key match, not inside a building; nearest existing node
             within d_max meters (k=1, ties broken on node_id).
  create     none of the above → new address node.

Key matching is an equi-join on the normalized addr_key (duplicate-node
detection, J6); containment is the cell-bucketed PIP join (J4); nearest is
the neighborhood kNN join (J5). All three shuffle on int64/short-string
keys; hot-cell salting is available on the spatial joins (J3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from osm_addr_tools_spark.functions import geo as G
from osm_addr_tools_spark.functions import normalize as N
from osm_addr_tools_spark.operators.joins import knn_join, pip_join

D_MAX_M = 10.0
# Containment-join bucket level sized to building-footprint scale (~12 m
# cells): the candidate count per point stays O(buildings overlapping one
# cell) even inside deliberately hot urban micro-boxes. Coarser levels
# collapse a hot block into one cell and the candidate join goes quadratic
# (measured 12.5 candidates/point at level 16 vs ~1.4 at 19 on the 20k-page
# fixture). Cover ⊇ containment holds at every level, so results are
# level-invariant; only candidate volume changes.
CONTAINMENT_LEVEL = 19


def existing_key_udf():
    """Normalize existing-node tags to the canonical duplicate-detection key
    (F4 over the tag map; street falls back to addr:place per OSM usage).
    Lazy factory: pandas_udf needs an active SparkContext."""

    @pandas_udf("struct<addr_key:string,has_postcode:boolean>")
    def keyer(tags: pd.Series) -> pd.Series:
        t = tags.map(lambda m: m or {})
        city = t.map(lambda m: m.get("addr:city", ""))
        street = t.map(lambda m: m.get("addr:street", ""))
        place = t.map(lambda m: m.get("addr:place", ""))
        hn = t.map(lambda m: m.get("addr:housenumber", ""))
        key = N.addr_key(city, street, place, hn)
        has_pc = t.map(lambda m: "addr:postcode" in m)
        return pd.DataFrame({"addr_key": key, "has_postcode": has_pc})

    return keyer


def _import_tags_col():
    """The tag map a created/attached node would carry (nulls dropped)."""
    m = F.create_map(
        F.lit("addr:city"), F.col("city"),
        F.lit("addr:street"), F.col("street"),
        F.lit("addr:housenumber"), F.col("housenumber"),
        F.lit("addr:postcode"), F.col("postcode"),
        F.lit("source:addr"), F.lit("webextract"),
    )
    return F.map_filter(m, lambda k, v: v.isNotNull())


_OUT_COLS = [
    "url", "addr_key", "city", "street", "housenumber", "postcode",
    "street_norm", "hn_norm", "lon", "lat",
    "match_kind", "matched_ref", "dist_m", "tags",
]


def run_conflate(
    spark,
    addrs: DataFrame,
    buildings: DataFrame,
    existing: DataFrame,
    d_max_m: float = D_MAX_M,
    containment_level: int = CONTAINMENT_LEVEL,
    salt: bool = False,
    **salt_kw,
) -> DataFrame:
    """addrs = EP1 output (geocoded rows are used; ungecoded are ignored).

    Returns the matches table (one row per geocoded extracted address):
    (url, addr_key, city, street, housenumber, postcode, street_norm,
    hn_norm, lon, lat, match_kind, matched_ref, dist_m, tags).

    Plan shape: a SINGLE linear dataflow — the three evidence joins (key
    match, containment, nearest) are LEFT joins onto the address set and
    one ``when``-chain projection applies the precedence. The alternative
    (union of branches carved out by anti-joins) evaluates the shared
    upstream once per branch; inside one action the concurrent branch
    stages race to populate caches and the extraction DAG runs multiple
    times (measured ~2× wall on the 20k-page fixture). The only
    materialization points are the two genuinely shared frontiers (the
    address set, the keyed existing set), persisted and eagerly realized —
    in a production multi-stage run these are exactly the cut points the
    checkpoint manifest (plans/manifest.py) writes to parquet.
    """
    from pyspark import StorageLevel

    def pin(df: DataFrame) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # eager: prevents concurrent duplicate-evaluation races
        return df

    a = pin(addrs.where(F.col("geocoded")).drop("geocoded"))

    # --- existing side: normalized key + one deterministic node per key ----
    ex = pin(
        existing.select(
            "node_id", "lon", "lat", "tags", existing_key_udf()("tags").alias("k")
        ).select(
            "node_id",
            F.col("lon").alias("e_lon"),
            F.col("lat").alias("e_lat"),
            F.col("tags").alias("e_tags"),
            F.col("k.addr_key").alias("addr_key"),
            F.col("k.has_postcode").alias("has_postcode"),
        )
    )
    w_key = Window.partitionBy("addr_key").orderBy(F.col("node_id").asc())
    ex_best = (
        ex.withColumn("_rn", F.row_number().over(w_key))
        .where(F.col("_rn") == 1)
        .select("addr_key", F.col("node_id").alias("k_node"),
                "has_postcode", "e_lon", "e_lat", "e_tags")
    )

    # --- evidence 2: containment (J4) → smallest containing building --------
    unaddressed = buildings.where(
        ~F.map_contains_key(F.col("tags"), F.lit("addr:housenumber"))
    ).select("building_id", "rings")
    best_building = (
        pip_join(a.select("url", "addr_key", "lon", "lat"), unaddressed,
                 containment_level, salt=salt, **salt_kw)
        .groupBy("url", "addr_key")
        .agg(F.min("building_id").alias("b_ref"))
    )

    # --- evidence 3: nearest existing node within d_max (J5, k=1) -----------
    near1 = knn_join(
        a.select("url", "addr_key", "lon", "lat"),
        ex.select("node_id", F.col("e_lon").alias("c_lon"),
                  F.col("e_lat").alias("c_lat")),
        query_id=["url", "addr_key"],
        cand_id="node_id",
        d_max_m=d_max_m,
        k=1,
        salt=salt,
        **salt_kw,
    ).select("url", "addr_key", F.col("node_id").alias("n_node"),
             F.col("dist_m").alias("n_dist"))

    # --- evidence 1 (key equi-join, J6) + one-pass precedence projection ----
    # shuffle_hash hints: these right sides come from UDF subtrees with
    # unreliable static size estimates; a misestimated initial broadcast
    # would serialize them through the driver. AQE converts back to
    # broadcast at runtime where genuinely small.
    j = (
        a.join(ex_best.hint("shuffle_hash"), "addr_key", "left")
        .join(best_building.hint("shuffle_hash"), ["url", "addr_key"], "left")
        .join(near1.hint("shuffle_hash"), ["url", "addr_key"], "left")
    )
    is_dup = F.col("k_node").isNotNull() & (
        F.col("has_postcode") | F.col("postcode").isNull()
    )
    is_upd = F.col("k_node").isNotNull() & ~(
        F.col("has_postcode") | F.col("postcode").isNull()
    )
    is_attach = F.col("k_node").isNull() & F.col("b_ref").isNotNull()
    is_near = (
        F.col("k_node").isNull()
        & F.col("b_ref").isNull()
        & F.col("n_node").isNotNull()
    )
    key_dist = G.haversine_m(F.col("lon"), F.col("lat"), F.col("e_lon"), F.col("e_lat"))
    out = j.select(
        *[c for c in a.columns],
        F.when(is_dup, "duplicate")
        .when(is_upd, "update")
        .when(is_attach, "attach")
        .when(is_near, "nearest")
        .otherwise("create")
        .alias("match_kind"),
        F.when(is_dup | is_upd, F.col("k_node"))
        .when(is_attach, F.col("b_ref"))
        .when(is_near, F.col("n_node"))
        .alias("matched_ref"),
        F.when(is_dup | is_upd, key_dist)
        .when(is_attach, F.lit(0.0))
        .when(is_near, F.col("n_dist"))
        .alias("dist_m"),
        F.when(is_dup, F.col("e_tags"))
        .when(
            is_upd,
            F.map_concat(
                F.col("e_tags"),
                F.create_map(F.lit("addr:postcode"), F.col("postcode")),
            ),
        )
        .otherwise(_import_tags_col())
        .alias("tags"),
    )
    return out.select(*_OUT_COLS)


def match_metrics(matches: DataFrame) -> DataFrame:
    """A1/A5 reporting: counts + match rate by kind with rollup."""
    return (
        matches.rollup("match_kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("match_kind").asc_nulls_last())
    )
