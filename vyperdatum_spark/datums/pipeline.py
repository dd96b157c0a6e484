"""Vertical-datum pipeline compiler (pure Python, driver-side).

Semantics match the reference's planner (see
/root/reference/vyperdatum/pipeline.py:20-48 ``datum_definition``,
:51-94 ``get_regional_pipeline``, :116-142 ``compare_datums``,
:145-168 ``inverse_datum_def``) re-expressed from scratch:

- A vertical datum is an ordered list of grid-shift steps from the
  ellipsoid down to that datum.
- To transform A→B: strip the common prefix of the two step lists
  (shared steps cancel), invert the remaining input-side steps
  (reversed order, inv flag flipped), then append the output-side
  steps.
- Identical datums compile to the null transform (``None``).

Numeric convention (ours, applied engine-wide and in the closed-form
oracles): a FORWARD step subtracts the interpolated grid value
(``z' = z - v(x, y)``), an INVERSE step adds it. The compiled plan is
a list of ``(grid_id, sign)`` with ``z_out = z_in + Σ sign·v_i(x,y)``.

The PROJ-style pipeline string (``+proj=pipeline +step [+inv]
+proj=vgridshift grids=...``) is kept as the machine-readable lineage
artifact, mirroring the reference's REMARK contract
(/root/reference/vyperdatum/vypercrs.py:610-623).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Step:
    """One grid-shift step. ``grid`` may contain the placeholders
    ``GEOID`` and ``REGION`` resolved at compile time."""

    grid: str
    inv: bool = False

    def inverted(self) -> "Step":
        return Step(self.grid, not self.inv)

    @property
    def sign(self) -> float:
        # forward subtracts the grid value, inverse adds it
        return 1.0 if self.inv else -1.0

    def to_proj(self) -> str:
        inv = "+inv " if self.inv else ""
        return f"{inv}+proj=vgridshift grids={self.grid}"


# Ordered step lists ellipsoid → datum. Structure mirrors the
# reference's datum_definition (pipeline.py:20-48): navd88 is one
# geoid step; tidal datums go geoid → inverse tss → datum grid.
DATUM_DEFINITION: dict[str, tuple[Step, ...]] = {
    "ellipse": (),
    "geoid": (Step("GEOID"),),
    "navd88": (Step("GEOID"),),
    "tss": (Step("GEOID"), Step("REGION/tss.gtx", inv=True)),
    "mllw": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mllw.gtx"),
    ),
    "noaa chart datum": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mllw.gtx"),
    ),
    "mhw": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mhw.gtx"),
    ),
    "noaa chart height": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mhw.gtx"),
    ),
    "mtl": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mtl.gtx"),
    ),
    "dtl": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/dtl.gtx"),
    ),
    "mlw": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mlw.gtx"),
    ),
    "mhhw": (
        Step("GEOID"),
        Step("REGION/tss.gtx", inv=True),
        Step("REGION/mhhw.gtx"),
    ),
}

# Axis direction follows the reference's substring rule
# (vypercrs.py:545-552): ellipse → ellipsoid height (up); geoid /
# navd88 / tss → gravity-related height (up); EVERY OTHER datum
# (mllw, mhw, mtl, dtl, mlw, mhhw, the chart aliases) → depth
# (positive-DOWN). The golden data confirms it: z_nad83 = +10.5 maps
# to z_mllw = −49.393 (vdatum_validation.py:1403-1405) — tidal outputs
# are sign-flipped.
HEIGHT_DATUM_MARKERS: tuple[str, ...] = ("ellipse", "geoid", "navd88", "tss")


def validate_datums(*datums: str) -> None:
    for d in datums:
        if d.lower() not in DATUM_DEFINITION:
            raise ValueError(
                f"Datum {d!r} not in datum definitions: "
                f"{sorted(DATUM_DEFINITION)}"
            )


def strip_common_prefix(
    in_def: tuple[Step, ...], out_def: tuple[Step, ...]
) -> tuple[tuple[Step, ...], tuple[Step, ...]]:
    """Drop the shared leading steps of the two definitions — they
    cancel out (reference compare_datums, pipeline.py:116-142)."""
    n = 0
    for a, b in zip(in_def, out_def):
        if a != b:
            break
        n += 1
    return in_def[n:], out_def[n:]


def invert_steps(steps: tuple[Step, ...]) -> tuple[Step, ...]:
    """Reverse order and flip each step's inv flag (reference
    inverse_datum_def, pipeline.py:145-168)."""
    return tuple(s.inverted() for s in reversed(steps))


def compile_steps(
    from_datum: str, to_datum: str, region: str, geoid: str
) -> list[tuple[str, float]] | None:
    """Compile A→B for one region into [(grid_id, sign), ...] in
    application order, or None for the null transform."""
    from_datum, to_datum = from_datum.lower(), to_datum.lower()
    if from_datum == to_datum:
        return None
    validate_datums(from_datum, to_datum)
    in_def, out_def = strip_common_prefix(
        DATUM_DEFINITION[from_datum], DATUM_DEFINITION[to_datum]
    )
    plan = (*invert_steps(in_def), *out_def)
    return [
        (s.grid.replace("REGION", region).replace("GEOID", geoid), s.sign)
        for s in plan
    ]


def compile_pipeline_string(
    from_datum: str, to_datum: str, region: str, geoid: str
) -> str | None:
    """PROJ-style lineage string for the compiled plan (reference
    get_regional_pipeline, pipeline.py:51-94)."""
    from_datum, to_datum = from_datum.lower(), to_datum.lower()
    if from_datum == to_datum:
        return None
    validate_datums(from_datum, to_datum)
    in_def, out_def = strip_common_prefix(
        DATUM_DEFINITION[from_datum], DATUM_DEFINITION[to_datum]
    )
    plan = (*invert_steps(in_def), *out_def)
    body = " +step ".join(["+proj=pipeline", *(s.to_proj() for s in plan)])
    return body.replace("REGION", region).replace("GEOID", geoid)


def output_flip(to_datum: str) -> float:
    """-1.0 when the output datum's axis is positive-down."""
    return 1.0 if is_height(to_datum) else -1.0


def is_height(datum: str) -> bool:
    """True when the datum's native z axis is positive-UP — the
    reference's substring rule (vypercrs.py:545-552)."""
    d = datum.lower()
    return (not d) or any(k in d for k in HEIGHT_DATUM_MARKERS)


def axis_flips(from_datum: str, to_datum: str) -> tuple[float, float]:
    """(flip_in, flip_out) for the F4 sign matrix.

    Mirrors the reference exactly (core.py:397-403 negates input z for
    a depth input; :441-449 ``flip = 1 if out_crs.is_height else -1``
    applied after the pipeline; raster.py:356-364 is the combined
    ``in.is_height == out.is_height`` form):

        z_out = flip_out * (flip_in * z + sep)

    so a depth→height pair flips once, depth→depth twice (net 0).
    """
    flip_in = 1.0 if is_height(from_datum) else -1.0
    flip_out = 1.0 if is_height(to_datum) else -1.0
    return flip_in, flip_out
