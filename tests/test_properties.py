"""Hypothesis property fuzzing for the pure kernels (no SparkSession —
fast, derandomized). The seeded-numpy suites (test_cells/test_normalize)
pin known cases; these sweep the input space for the invariants that must
hold EVERYWHERE: encode/center roundtrips, parent lattice consistency,
ring = iterated-neighbor dilation, normalization idempotence, similarity
blocking losslessness, winnowing vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from osm_addr_tools_spark.functions import cells as C
from osm_addr_tools_spark.functions import normalize as N
from osm_addr_tools_spark.functions import text as T

# lat capped short of the poles: the lon/lat chart degenerates there (any
# lon maps to the same point), which breaks the roundtrip STATEMENT, not
# the encoder.
lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
levels = st.integers(min_value=1, max_value=C.MAX_LEVEL)


@settings(max_examples=200, deadline=None)
@given(lons, lats, levels)
def test_encode_center_reencode_fixpoint(lon, lat, level):
    """encode → center → encode is a fixpoint: a cell's center must encode
    to the cell itself at the same level."""
    cell = C.cell_encode(np.array([lon]), np.array([lat]), level)
    clon, clat = C.cell_center_lonlat(cell)
    again = C.cell_encode(clon, clat, level)
    assert again[0] == cell[0]


@settings(max_examples=200, deadline=None)
@given(lons, lats, st.integers(min_value=0, max_value=C.MAX_LEVEL - 1), st.integers(min_value=1, max_value=8))
def test_parent_lattice_consistency(lon, lat, coarse, delta):
    """Encoding at a finer level then taking the ancestor equals encoding
    at the coarser level directly — the parent lattice is consistent with
    the encoder at EVERY pair of levels."""
    fine = min(C.MAX_LEVEL, coarse + delta)
    c_fine = C.cell_encode(np.array([lon]), np.array([lat]), fine)
    c_coarse = C.cell_encode(np.array([lon]), np.array([lat]), coarse)
    assert C.cell_parent(c_fine.astype(np.uint64), coarse)[0] == np.uint64(c_coarse[0])


@settings(max_examples=100, deadline=None)
@given(lons, lats, st.integers(min_value=2, max_value=20), st.integers(min_value=1, max_value=3))
def test_ring_equals_iterated_neighbor_dilation(lon, lat, level, r):
    """cell_ring(r) == r-fold 8-neighbor dilation of {cell} — including
    cells near face seams where the vectorized block falls back."""
    cell = C.cell_encode(np.array([lon]), np.array([lat]), level).astype(np.int64)
    ring = set(int(x) for x in C.cell_ring(cell, r)[0])
    cur = {int(cell[0])}
    for _ in range(r):
        nxt = set(cur)
        for c in cur:
            nxt.update(int(x) for x in C.cell_neighbors(np.array([c], dtype=np.int64))[0])
        cur = nxt
    assert ring == cur


ascii_streets = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@settings(max_examples=300, deadline=None)
@given(ascii_streets)
def test_norm_street_idempotent(s):
    once = N.norm_street(pd.Series([s]))
    twice = N.norm_street(once)
    assert once.iloc[0] == twice.iloc[0]


def test_norm_street_idempotent_regressions():
    """Hypothesis-discovered r3 counterexamples, pinned forever: punctuation
    stripped AFTER prefix expansion hid the designator on pass 1."""
    cases = [".sT", ".ul Dluga", '"st" main', "ul. pl. Wolnosci", "ul ul x"]
    once = N.norm_street(pd.Series(cases))
    twice = N.norm_street(once)
    assert once.tolist() == twice.tolist()
    assert once.tolist() == ["street", "dluga", "street main", "plac wolnosci", "x"]


@settings(max_examples=300, deadline=None)
@given(ascii_streets)
def test_norm_housenumber_idempotent(s):
    once = N.norm_housenumber(pd.Series([s]))
    twice = N.norm_housenumber(once)
    assert once.iloc[0] == twice.iloc[0]


@settings(max_examples=200, deadline=None)
@given(ascii_streets, ascii_streets)
def test_similarity_tau_fast_path_lossless(a, b):
    """The tau-blocked similarity must (1) never block a pair whose exact
    ratio ≥ tau, and (2) return the exact ratio for every survivor — the
    provable-upper-bound contract the conflate fuzzy join relies on."""
    tau = 0.75
    exact = N.street_similarity(pd.Series([a]), pd.Series([b])).iloc[0]
    fast = N.street_similarity(pd.Series([a]), pd.Series([b]), tau=tau).iloc[0]
    if exact >= tau:
        assert fast == exact
    else:
        assert fast < tau


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
def test_winnow_matches_bruteforce(s):
    from tests.test_text import _winnow_naive

    assert T.winnow_fingerprints(s) == _winnow_naive(s)


# --- prefix-sum bucketing (operators/prefix_sum.py) -------------------------
# The distributed running sum is correct iff bucket assignment is monotone
# NON-DECREASING in the order key (any monotone bucketing yields the
# identical running sum once offsets are added). The Column expression is
# floor((double(k) - min) * nb / span) clamped to [0, nb); replicate it in
# float64 (same IEEE semantics) and pin monotonicity over adversarial
# int64 keys — including magnitudes where double rounding collapses
# neighboring keys (collapse merges buckets, which is harmless; a RANK
# INVERSION would corrupt the prefix sum).

_keys64 = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60
)


@settings(max_examples=300, deadline=None)
@given(_keys64, st.integers(min_value=1, max_value=4096))
def test_uniform_bucket_monotone_in_key(keys, nb):
    k = np.array(sorted(keys), dtype=np.int64)
    kd = k.astype(np.float64)
    kmin, kmax = float(kd.min()), float(kd.max())
    span = kmax - kmin + 1.0
    raw = np.floor((kd - kmin) * float(nb) / span)
    b = np.clip(raw, 0, nb - 1)
    assert (np.diff(b) >= 0).all()          # monotone: no rank inversion
    assert b.min() >= 0 and b.max() <= nb - 1
