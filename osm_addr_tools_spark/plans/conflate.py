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
CONTAINMENT_LEVEL = 16


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
    """
    a = addrs.where(F.col("geocoded")).drop("geocoded")

    # --- existing side: normalized key + one deterministic node per key ----
    ex = existing.select(
        "node_id", "lon", "lat", "tags", existing_key_udf()("tags").alias("k")
    ).select(
        "node_id",
        F.col("lon").alias("e_lon"),
        F.col("lat").alias("e_lat"),
        F.col("tags").alias("e_tags"),
        F.col("k.addr_key").alias("addr_key"),
        F.col("k.has_postcode").alias("has_postcode"),
    )
    w_key = Window.partitionBy("addr_key").orderBy(F.col("node_id").asc())
    ex_best = (
        ex.withColumn("_rn", F.row_number().over(w_key))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    # --- stage 1: duplicate / update via addr_key equi-join (J6) -----------
    key_hit = a.join(ex_best, "addr_key", "inner")
    dup_upd = key_hit.select(
        *[c for c in a.columns],
        F.when(
            F.col("has_postcode") | F.col("postcode").isNull(), F.lit("duplicate")
        ).otherwise(F.lit("update")).alias("match_kind"),
        F.col("node_id").alias("matched_ref"),
        G.haversine_m(F.col("lon"), F.col("lat"), F.col("e_lon"), F.col("e_lat")).alias("dist_m"),
        F.when(
            F.col("has_postcode") | F.col("postcode").isNull(), F.col("e_tags")
        ).otherwise(
            F.map_concat(
                F.col("e_tags"),
                F.create_map(F.lit("addr:postcode"), F.col("postcode")),
            )
        ).alias("tags"),
    )
    remaining = a.join(ex_best.select("addr_key"), "addr_key", "left_anti")

    # --- stage 2: attach via containment join (J4) --------------------------
    unaddressed = buildings.where(
        ~F.map_contains_key(F.col("tags"), F.lit("addr:housenumber"))
    ).select("building_id", "rings")
    contained = pip_join(
        remaining, unaddressed, containment_level, salt=salt, **salt_kw
    )
    w_b = Window.partitionBy("url", "addr_key").orderBy(F.col("building_id").asc())
    attach = (
        contained.withColumn("_rn", F.row_number().over(w_b))
        .where(F.col("_rn") == 1)
        .select(
            *[c for c in a.columns],
            F.lit("attach").alias("match_kind"),
            F.col("building_id").alias("matched_ref"),
            F.lit(0.0).alias("dist_m"),
            _import_tags_col().alias("tags"),
        )
    )
    rest = remaining.join(
        attach.select("url", "addr_key"), ["url", "addr_key"], "left_anti"
    )

    # --- stage 3: nearest within d_max via kNN join (J5) --------------------
    cands = ex.select(
        "node_id", F.col("e_lon").alias("c_lon"), F.col("e_lat").alias("c_lat")
    )
    near_raw = knn_join(
        rest.withColumn("_qid", F.concat_ws("", "url", "addr_key")),
        cands,
        query_id="_qid",
        cand_id="node_id",
        d_max_m=d_max_m,
        k=1,
        salt=salt,
        **salt_kw,
    )
    nearest = near_raw.select(
        *[c for c in a.columns],
        F.lit("nearest").alias("match_kind"),
        F.col("node_id").alias("matched_ref"),
        F.col("dist_m"),
        _import_tags_col().alias("tags"),
    )

    # --- stage 4: create ----------------------------------------------------
    create = rest.join(
        nearest.select("url", "addr_key"), ["url", "addr_key"], "left_anti"
    ).select(
        *[c for c in a.columns],
        F.lit("create").alias("match_kind"),
        F.lit(None).cast("long").alias("matched_ref"),
        F.lit(None).cast("double").alias("dist_m"),
        _import_tags_col().alias("tags"),
    )

    out = dup_upd.unionByName(attach).unionByName(nearest).unionByName(create)
    return out.select(*_OUT_COLS)


def match_metrics(matches: DataFrame) -> DataFrame:
    """A1/A5 reporting: counts + match rate by kind with rollup."""
    return (
        matches.rollup("match_kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("match_kind").asc_nulls_last())
    )
