"""EP3 — tile: features → raster tile assignments (SURVEY.md §3 EP3).

Vector→raster: points map narrowly (one pandas-UDF stage, zero shuffle);
polygons rasterize via the C4 scanline cover then explode. Raster→vector
(C5) reassembles a cell set into boundary rings via grouped applyInPandas.
Tile-assignment exactness is a gated metric (BASELINE.json) — goldens are
pinned against the pure-Python oracle in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_addr_tools_spark.functions import cells as C
from osm_addr_tools_spark.operators.joins import cell_encode_udf, cover_polygon_udf


def run_tile_points(
    points: DataFrame, level: int, id_col: str = "feature_id",
    lon: str = "lon", lat: str = "lat",
) -> DataFrame:
    """(feature_id, tile_id) for point features — narrow, no shuffle."""
    return points.select(
        F.col(id_col).alias("feature_id"),
        cell_encode_udf(level)(F.col(lon), F.col(lat)).alias("tile_id"),
    )


def run_tile_polygons(
    polygons: DataFrame, level: int, id_col: str = "building_id",
    rings: str = "rings",
) -> DataFrame:
    """(feature_id, tile_id) pairs: every tile intersecting each polygon."""
    return polygons.select(
        F.col(id_col).alias("feature_id"),
        F.explode(cover_polygon_udf(level)(F.col(rings))).alias("tile_id"),
    )


def tile_density(assignments: DataFrame) -> DataFrame:
    """A1 hash-agg over tile ids — feeds the hot-cell histogram that EP2's
    salting consumes (tiling is upstream of skew planning by design)."""
    return assignments.groupBy("tile_id").agg(F.count(F.lit(1)).alias("n_features"))


def run_untile(assignments: DataFrame) -> DataFrame:
    """C5 raster→vector: per feature, union its tiles back into boundary
    rings (grouped applyInPandas — one group per feature)."""

    def trace(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = pdf["feature_id"].iloc[0]
        rings = C.cells_to_polygon(pdf["tile_id"].to_numpy())
        return pd.DataFrame(
            {
                "feature_id": [int(fid)],
                "rings": [[[{"lon": float(x), "lat": float(y)} for x, y in r] for r in rings]],
            }
        )

    return assignments.groupBy("feature_id").applyInPandas(
        trace,
        schema="feature_id long, rings array<array<struct<lon:double,lat:double>>>",
    )
