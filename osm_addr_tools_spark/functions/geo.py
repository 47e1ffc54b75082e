"""Geo math: haversine (F5) as pure Column expressions, point-in-polygon
ray-cast kernel (J4 refine step).

SURVEY.md §2.8 F5: haversine stays JVM-side (built-in Column math inside
whole-stage codegen — no UDF). The PIP kernel is NumPy-vectorized over
Arrow batches for the containment-join refinement (SURVEY §2.4 J4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # WGS84 mean radius (BASELINE/SURVEY §2.8 F5)


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters as a pure Column expression."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin(dlon / 2), 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Same formula, NumPy — used by the pure-Python golden oracle so the
    engine and oracle share one pinned definition."""
    lon1, lat1, lon2, lat2 = (np.asarray(x, dtype=np.float64) for x in (lon1, lat1, lon2, lat2))
    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: are points (px, py) inside ``ring``
    (ndarray (n, 2) of lon/lat vertices, straight edges in lon/lat space —
    exact at building-footprint scale, pinned semantics shared with the
    test oracle)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = ring[:, 0]
    ys = ring[:, 1]
    inside = np.zeros(px.shape, dtype=bool)
    n = len(xs)
    for a in range(n):
        b = (a + 1) % n
        ya, yb = ys[a], ys[b]
        xa, xb = xs[a], xs[b]
        crosses = (ya > py) != (yb > py)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (py - ya) * (xb - xa) / (yb - ya)
        inside ^= crosses & (px < xint)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Inside outer ring and NOT inside any hole (even-odd per ring)."""
    if not rings:
        return np.zeros(np.asarray(px).shape, dtype=bool)
    result = points_in_ring(px, py, np.asarray(rings[0], dtype=np.float64))
    for hole in rings[1:]:
        result &= ~points_in_ring(px, py, np.asarray(hole, dtype=np.float64))
    return result
