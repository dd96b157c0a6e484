"""Pipeline-compiler parity tests.

Ports the semantic content of the reference's tests/test_pipeline.py
(structural step counts, inversion, common-prefix removal, null
transform, case-insensitivity) and tests/test_vypercrs.py:371-380
(navd88→mllw must skip the shared geoid step)."""

import pytest

from vyperdatum_spark.datums import pipeline as pl


def test_null_transform():
    assert pl.compile_steps("mllw", "mllw", "R", "G") is None
    assert pl.compile_pipeline_string("ellipse", "ellipse", "R", "G") is None


def test_case_insensitive():
    assert pl.compile_steps("MLLW", "Mllw", "R", "G") is None
    assert pl.compile_steps("NAVD88", "MLLW", "R", "G") == pl.compile_steps(
        "navd88", "mllw", "R", "G"
    )


def test_unknown_datum_raises():
    with pytest.raises(ValueError):
        pl.compile_steps("nad27_bogus", "mllw", "R", "G")


def test_ellipse_to_mllw_three_steps():
    steps = pl.compile_steps("ellipse", "mllw", "RGN", "geoid.gtx")
    assert steps == [
        ("geoid.gtx", -1.0),
        ("RGN/tss.gtx", 1.0),
        ("RGN/mllw.gtx", -1.0),
    ]


def test_common_prefix_skips_geoid():
    # reference tests/test_vypercrs.py:371-380: navd88→mllw is 2 steps
    steps = pl.compile_steps("navd88", "mllw", "RGN", "geoid.gtx")
    assert len(steps) == 2
    assert steps == [("RGN/tss.gtx", 1.0), ("RGN/mllw.gtx", -1.0)]


def test_inverse_is_mirrored():
    fwd = pl.compile_steps("ellipse", "mllw", "RGN", "geoid.gtx")
    inv = pl.compile_steps("mllw", "ellipse", "RGN", "geoid.gtx")
    assert inv == [(g, -s) for g, s in reversed(fwd)]


def test_round_trip_cancels():
    # applying fwd then inv sums signs to zero per grid
    fwd = pl.compile_steps("ellipse", "mhw", "RGN", "geoid.gtx")
    inv = pl.compile_steps("mhw", "ellipse", "RGN", "geoid.gtx")
    total = {}
    for g, s in fwd + inv:
        total[g] = total.get(g, 0.0) + s
    assert all(v == 0.0 for v in total.values())


def test_tss_to_mllw_single_step():
    steps = pl.compile_steps("tss", "mllw", "RGN", "geoid.gtx")
    assert steps == [("RGN/mllw.gtx", -1.0)]


def test_mllw_to_mhw_via_tss():
    steps = pl.compile_steps("mllw", "mhw", "RGN", "geoid.gtx")
    assert steps == [("RGN/mllw.gtx", 1.0), ("RGN/mhw.gtx", -1.0)]


def test_pipeline_string_format():
    s = pl.compile_pipeline_string("navd88", "mllw", "RGNAcoast01_8301", "g.gtx")
    assert s == (
        "+proj=pipeline "
        "+step +inv +proj=vgridshift grids=RGNAcoast01_8301/tss.gtx "
        "+step +proj=vgridshift grids=RGNAcoast01_8301/mllw.gtx"
    )


def test_output_flip():
    # reference substring axis rule (vypercrs.py:545-552): tidal
    # datums are ALL depth (golden z_mllw is negative,
    # vdatum_validation.py:1403-1405); only ellipse/geoid/navd88/tss
    # are height
    assert pl.output_flip("mllw") == -1.0
    assert pl.output_flip("noaa chart datum") == -1.0
    assert pl.output_flip("mhw") == -1.0
    assert pl.output_flip("navd88") == 1.0
    assert pl.output_flip("tss") == 1.0
    assert pl.output_flip("ellipse") == 1.0
    assert pl.is_height("mllw") is False and pl.is_height("geoid") is True
