"""Datum / CRS input resolution: EPSG ints, WKT, tuples, names.

The reference accepts all of these for ``set_input_datum`` /
``set_output_datum`` (vypercrs.py:685-743 ``VyperPipelineCRS.set_crs``,
``_set_single`` :763-812): an EPSG integer, a WKT string, a vertical
datum name, or a (horizontal, vertical) 2-tuple. This module maps any
of them onto the engine's (horizontal CRS name, vertical datum name)
pair; ``transform_points`` routes through it so callers can write
``transform_points(spark, df, 6319, "mllw")`` or pass a compound WKT.

The EPSG table is a synthetic-catalog ALIAS map (this engine's CRS
registry is self-contained); the codes chosen are the ones the
reference exercises (6318/6319 NAD83(2011), 5703 NAVD88, 5866 MLLW,
26919-style projected) so reference-shaped call sites port 1:1.
"""

from __future__ import annotations

from . import pipeline as pl, vypercrs

# EPSG-code aliases → (horizontal CRS name | None, vertical datum | None).
# Covers every code the reference itself exercises (vypercrs.py:20-25
# frame constants, core.py:1180 chart-datum default, the
# state-plane/UTM test variants); 3D geographic codes resolve to
# frame + ellipsoid height exactly like the reference's set_crs
# 3D→2D+vertical split (vypercrs.py:788-797).
EPSG_ALIASES: dict[int, tuple[str | None, str | None]] = {
    6318: ("nad83s", None),        # NAD83(2011) geographic 2D
    6319: ("nad83s", "ellipse"),   # NAD83(2011) geographic 3D
    5703: (None, "navd88"),        # NAVD88 height
    5714: (None, "tss"),           # MSL height (tss = the MSL surface)
    5866: (None, "mllw"),          # MLLW depth (reference chart default)
    5868: (None, "mhw"),           # MHW
    8999: ("itrfs", None),         # ITRF2008 2D (synthetic frame analog)
    7911: ("itrfs", "ellipse"),    # ITRF2008 3D
    9000: ("itrfs", None),         # ITRF2014 2D
    7912: ("itrfs", "ellipse"),    # ITRF2014 3D
    26919: ("utm_syn", None),      # UTM-style projected (synthetic)
    2264: ("spcs_syn", None),      # state-plane-style projected (synthetic)
}


def resolve(spec) -> tuple[str | None, str | None]:
    """Any accepted datum spec → (horizontal CRS name | None,
    vertical datum name | None)."""
    if isinstance(spec, int):
        try:
            return EPSG_ALIASES[spec]
        except KeyError:
            raise ValueError(
                f"EPSG {spec} not in the catalog alias table: "
                f"{sorted(EPSG_ALIASES)}"
            ) from None
    if isinstance(spec, tuple):
        if len(spec) != 2:
            raise ValueError(f"datum tuple must be (horizontal, vertical): {spec!r}")
        h1, v1 = resolve(spec[0])
        h2, v2 = resolve(spec[1])
        return h1 or h2, v2 or v1
    if isinstance(spec, str):
        s = spec.strip()
        if s.upper().startswith(("GEOGCRS[", "PROJCRS[")):
            # horizontal-only WKT (the synthetic registry's own
            # horiz_wkt_for_crs output): resolve by CRS name
            from ..spatial import crs as hcrs

            parts = s.split('"', 2)
            if len(parts) < 3:
                raise ValueError(
                    f"horizontal WKT has no quoted CRS name: {s[:60]!r}"
                )
            name = parts[1].lower()
            if name in hcrs.KNOWN_CRS:
                return name, None
            raise ValueError(
                f"horizontal WKT names unknown CRS {name!r}; known: "
                f"{sorted(hcrs.KNOWN_CRS)}"
            )
        if s.upper().startswith(("VERTCRS[", "COMPOUNDCRS[")):
            parsed = vypercrs.parse_vert_wkt(s)
            horiz = None
            if s.upper().startswith("COMPOUNDCRS["):
                # first quoted name inside the horizontal member
                body = s[s.index(",") + 1:]
                for name in ("nad83s", "itrfs", "spcs_syn", "utm_syn"):
                    if f'"{name.upper()}"' in body:
                        horiz = name
                        break
            return horiz, parsed["datum_name"].lower()
        if s.lower() in pl.DATUM_DEFINITION:
            return None, s.lower()
        from ..spatial import crs as hcrs

        if s.lower() in hcrs.KNOWN_CRS:
            return s.lower(), None
        raise ValueError(
            f"Datum {spec!r} is neither a datum name "
            f"({sorted(pl.DATUM_DEFINITION)}), a CRS name, WKT, nor EPSG"
        )
    raise ValueError(f"unsupported datum spec type: {type(spec).__name__}")


def resolve_vertical(spec, role: str) -> tuple[str, str | None]:
    """(vertical datum name, horizontal CRS name | None); vertical is
    REQUIRED — mirrors the reference erroring on an insufficiently
    specified datum (core.py:392-394)."""
    horiz, vert = resolve(spec)
    if vert is None:
        raise ValueError(
            f"{role} datum {spec!r} has no vertical component; pass a "
            "vertical datum name, a 3D/vertical EPSG, or a "
            "(horizontal, vertical) tuple"
        )
    return vert, horiz
