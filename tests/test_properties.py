"""Property-based tests (hypothesis) over the pure-Python/numpy
surfaces — cell-index algebra and the pipeline compiler. The reference
suite has no property tests (SURVEY §5); these pin the invariants the
distributed joins rely on, at thousands of generated cases per run,
without spinning Spark up per example.
"""

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vyperdatum_spark.datums import pipeline as pl
from vyperdatum_spark.spatial import cells

DATUMS = sorted(pl.DATUM_DEFINITION)
RES = st.integers(min_value=0, max_value=cells.FINE_RES)
# keep a hair inside the poles/antimeridian so floor() stays in range
LON = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
LAT = st.floats(min_value=-90.0, max_value=89.999, allow_nan=False)


@settings(max_examples=300)
@given(LON, LAT, RES)
def test_cell_contains_its_point_and_center_reencodes(lon, lat, res):
    cell = cells.encode_one(lon, lat, res)
    x0, y0, x1, y1 = cells.cell_bounds(cell)
    # containment up to one ulp of the +180/+90 shift: tiny negative
    # coords are absorbed by the offset add (e.g. -2e-16 + 180 == 180
    # exactly), landing in the cell at 0.0 — identically in all three
    # encode dialects, so the joins stay consistent
    eps = 1e-9
    assert x0 - eps <= lon < x1 + eps
    assert y0 - eps <= lat < y1 + eps
    cx, cy = cells.cell_center(cell)
    assert cells.encode_one(cx, cy, res) == cell


@settings(max_examples=300)
@given(LON, LAT, RES, RES)
def test_parent_commutes_with_encode(lon, lat, r1, r2):
    res, pres = max(r1, r2), min(r1, r2)
    fine = cells.encode_one(lon, lat, res)
    # deriving the coarse cell from the fine cell == encoding coarse
    assert cells.parent(fine, pres) == cells.encode_one(lon, lat, pres)


@settings(max_examples=200)
@given(st.lists(LON, min_size=1, max_size=16),
       st.lists(LAT, min_size=1, max_size=16), RES)
def test_encode_np_matches_scalar(lons, lats, res):
    n = min(len(lons), len(lats))
    lon = np.array(lons[:n])
    lat = np.array(lats[:n])
    got = cells.encode_np(lon, lat, res)
    want = [cells.encode_one(x, y, res) for x, y in zip(lon, lat)]
    assert got.tolist() == want


@settings(max_examples=200)
@given(LON, LAT, RES, st.integers(min_value=1, max_value=2))
def test_neighbors_contain_self_and_stay_adjacent(lon, lat, res, k):
    cell = cells.encode_one(lon, lat, res)
    nb = cells.neighbors(cell, k)
    assert cell in nb
    _, ix, iy = cells.decode(cell)
    for c in nb:
        r2, jx, jy = cells.decode(c)
        assert r2 == res and abs(jx - ix) <= k and abs(jy - iy) <= k


def _signed(steps):
    # compile_steps returns None for the same-name null transform and
    # [] for identical-definition pairs — both are the empty path
    c = Counter()
    for grid, sign in steps or ():
        c[grid] += int(sign)
    return {g: n for g, n in c.items() if n}


@settings(max_examples=300)
@given(st.sampled_from(DATUMS), st.sampled_from(DATUMS),
       st.sampled_from(DATUMS))
def test_compile_steps_is_a_path_difference(a, b, c):
    """The compiler output behaves like a difference of datum paths:
    identity is empty, inverse negates the signed grid multiset, and
    composition through any intermediate telescopes exactly (the
    property that makes the common-prefix elimination sound)."""
    region, geoid = "RGNAcoast01_8301", "GEOID"
    f = lambda u, v: pl.compile_steps(u, v, region, geoid)
    assert _signed(f(a, a)) == {}
    ab, ba = _signed(f(a, b)), _signed(f(b, a))
    assert ab == {g: -n for g, n in ba.items()}
    comp = Counter()
    for g, n in _signed(f(a, b)).items():
        comp[g] += n
    for g, n in _signed(f(b, c)).items():
        comp[g] += n
    assert {g: n for g, n in comp.items() if n} == _signed(f(a, c))


@settings(max_examples=100)
@given(st.sampled_from(DATUMS), st.sampled_from(DATUMS))
def test_axis_flips_match_is_height(a, b):
    fin, fout = pl.axis_flips(a, b)
    assert fin == (1.0 if pl.is_height(a) else -1.0)
    assert fout == (1.0 if pl.is_height(b) else -1.0)


# ------------------------------------------------------------------
# lemmas behind ops/ranges.py and ops/asof.py (pure-python mirrors of
# the Spark expressions — no Spark per example)
# ------------------------------------------------------------------

TS = st.floats(min_value=0.0, max_value=3.0e9, allow_nan=False)
BUCKET = st.sampled_from([1, 60, 3600, 86400, 604800])


@settings(max_examples=500)
@given(TS, TS, TS, BUCKET)
def test_range_bucket_coverage_lemma(s, length_seed, p_seed, B):
    """No (point, interval) pair can be missed by the bucketed
    rewrite: if s <= p < e then bucket(p) lies within the replica
    range [bucket(s), bucket(e)] — including the unix_timestamp
    truncation-to-seconds subtlety (`ops/ranges.py` end-bucket
    comment)."""
    e = s + (length_seed % 1.0e6)  # interval up to ~11 days
    p = s + (p_seed % 1.0e6)
    if not (s <= p < e):
        return
    # Spark's unix_timestamp truncates to whole seconds
    bucket = lambda t: int(t) // B
    assert bucket(s) <= bucket(p) <= bucket(e)


@settings(max_examples=500)
@given(
    st.lists(
        st.tuples(TS, st.integers(min_value=0, max_value=10**6)),
        min_size=0, max_size=30,
    ),
    TS,
)
def test_asof_carry_ordering_lemma(right_rows, left_t):
    """The union-and-carry pick — last right row in (t asc, tie asc)
    order among rows with t <= left_t — equals the brute-force argmax
    over (t, tie), which is what the row_number oracle computes."""
    elig = [(t, tie) for t, tie in right_rows if t <= left_t]
    carried = None
    for t, tie in sorted(elig):  # window order: t asc, tie asc
        carried = (t, tie)  # last non-null wins
    expected = max(elig) if elig else None
    assert carried == expected
