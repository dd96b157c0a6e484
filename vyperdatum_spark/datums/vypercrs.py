"""Compound-WKT lineage contract: build + parse + validity machine.

The reference documents every output's full transformation lineage in
a VERTCRS whose REMARK carries the vdatum version, base datum, region
list, and PROJ pipeline list (vypercrs.py:528-663, remark builder
:610-623), parses it back (:403-445), and gates validity on the remark
carrying all four fields (:814-858). That REMARK is the machine-
readable contract that makes the inverse transform recoverable from
output metadata alone (SURVEY.md §3.3); tests/test_core.py:186-199
round-trips it.

This module re-expresses the contract from scratch: WKT text in/out is
pure driver-side string work; the engine attaches the compound WKT as
a job artifact and the ``geo_lineage_wkt`` oracle query checks the
round trip row-by-row.
"""

from __future__ import annotations

from . import catalog, pipeline as pl

ENGINE_VERSION = "vyperdatum_spark 0.2.0"

# the reference matches grid-file md5 sets against known VDatum
# releases (core.py:1109-1147, vdatum_validation.py:78-1388); the
# synthetic catalog has exactly one known release
KNOWN_VDATUM_VERSIONS: dict[str, str] = {}


def _register_known_version() -> None:
    from ..engine import sinks

    KNOWN_VDATUM_VERSIONS[sinks.catalog_version()] = "vdatum_syn_4.2"


def detect_vdatum_version() -> str:
    """Match the live catalog fingerprint against the known-release
    hash table (reference core.py:1109-1147). Unknown grid sets get an
    'unknown/<hash8>' marker rather than an error — the reference logs
    and continues."""
    if not KNOWN_VDATUM_VERSIONS:
        _register_known_version()
    from ..engine import sinks

    fp = sinks.catalog_version()
    return KNOWN_VDATUM_VERSIONS.get(fp, f"unknown/{fp[:8]}")


def axis_for_datum(datum_name: str) -> tuple[str, str]:
    """(axis name, direction) — mirrors VerticalPipelineCRS.__init__
    (vypercrs.py:545-552) and the is_height derivation (:830-835)."""
    d = datum_name.lower()
    if "ellipse" in d or not d:
        return "ellipsoid height (h)", "up"
    if "geoid" in d or "navd88" in d or "tss" in d:
        return "gravity-related height (H)", "up"
    return "depth (D)", "down"


def build_remarks(vdatum_version: str, base_datum: str,
                  regions: list[str], pipelines: list[str]) -> str:
    regions_s = "[" + ",".join(regions) + "]"
    pipelines_s = "[" + ";".join(pipelines) + "]"
    return (
        f'REMARK["vdatum={vdatum_version},vyperdatum={ENGINE_VERSION},'
        f"base_datum=[{base_datum}],regions={regions_s},"
        f'pipelines={pipelines_s}"]'
    )


def build_vert_wkt(datum_name: str, regions: list[str],
                   pipelines: list[str], base_datum: str = "nad83s",
                   vdatum_version: str | None = None) -> str:
    axis, direction = axis_for_datum(datum_name)
    vv = vdatum_version or detect_vdatum_version()
    members = [
        f'VDATUM["{datum_name}"]',
        "CS[vertical,1]",
        f'AXIS["{axis}",{direction}]',
        'LENGTHUNIT["metre",1.0]',
    ]
    if pipelines:
        members.append(build_remarks(vv, base_datum, regions, pipelines))
    # comma-join so a lineage-less CRS (no REMARK) still closes with a
    # well-formed bracket — external WKT parsers reject ",]"
    return f'VERTCRS["{datum_name}",' + ",".join(members) + "]"


def build_compound_wkt(horiz_wkt: str, vert_wkt: str) -> str:
    """COMPOUNDCRS wrapper (vypercrs.py:639-651)."""
    horiz_name = horiz_wkt.split('"')[1]
    vert_name = vert_wkt.split('"')[1]
    return (
        f'COMPOUNDCRS["{horiz_name} + {vert_name}",{horiz_wkt},{vert_wkt}]'
    )


def horiz_wkt_for_crs(crs_name: str) -> str:
    """Synthetic horizontal WKT for the spatial.crs registry."""
    from ..spatial import crs as hcrs

    n = hcrs.validate_crs(crs_name)
    frame = hcrs.CRS_FRAME[n]
    if n in ("nad83s", "itrfs"):
        return (
            f'GEOGCRS["{n.upper()}",DATUM["{frame} (synthetic)"],'
            f'CS[ellipsoidal,2],AXIS["longitude",east],'
            f'AXIS["latitude",north],ANGLEUNIT["degree",0.0174532925199433]]'
        )
    return (
        f'PROJCRS["{n.upper()}",BASEGEOGCRS["{frame} (synthetic)"],'
        f'CS[Cartesian,2],AXIS["easting (E)",east],'
        f'AXIS["northing (N)",north],LENGTHUNIT["metre",1.0]]'
    )


# --------------------------------------------------------------------
# parse back (vypercrs.py:403-445 _wkt_pipeline_remarks)
# --------------------------------------------------------------------

def _search_string(wkt: str, key: str) -> str:
    start = wkt.find(key)
    if start == -1:
        return ""
    q1 = wkt.find('"', start)
    q2 = wkt.find('"', q1 + 1)
    return wkt[q1 + 1:q2]


def parse_remarks(wkt: str):
    """(regions, pipelines, vdatum_version, engine_version, base_datum)
    — the reference's find-based remark parser re-expressed."""
    remarks = _search_string(wkt, "REMARK[")
    if not remarks:
        return [], [], None, None, None

    def _scalar(key: str):
        i = remarks.find(key)
        if i == -1:
            return None
        s = i + len(key)
        return remarks[s:remarks.find(",", s)]

    def _list(key: str, sep: str):
        i = remarks.find(key)
        if i == -1:
            return []
        s = i + len(key) + 1  # skip the '['
        e = remarks.find("]", s)
        body = remarks[s:e]
        return [x.strip() for x in body.split(sep) if x.strip()]

    vdatum_version = _scalar("vdatum=")
    # engine version may contain commas-free text; scalar read is fine
    engine_version = _scalar("vyperdatum=")
    base = _list("base_datum=", ",")
    regions = _list("regions=", ",")
    pipelines = _list("pipelines=", ";")
    if not regions:
        raise ValueError(f"no regions keyword in remarks: {remarks!r}")
    if not pipelines:
        raise ValueError(f"no pipelines keyword in remarks: {remarks!r}")
    return regions, pipelines, vdatum_version, engine_version, base


def parse_vert_wkt(wkt: str) -> dict:
    """Full VERTCRS parse: datum name, axis, direction, remark fields."""
    datum_name = _search_string(wkt, "VERTCRS[")
    axis = _search_string(wkt, "AXIS[")
    # direction token follows the axis name inside AXIS[...]
    a = wkt.find("AXIS[")
    seg = wkt[a:wkt.find("]", a)]
    direction = seg.rsplit(",", 1)[-1].strip()
    out = {
        "datum_name": datum_name,
        "axis": axis,
        "is_height": direction == "up",
    }
    if "REMARK[" in wkt:
        regions, pipelines, vv, ev, base = parse_remarks(wkt)
        out.update({
            "regions": regions, "pipelines": pipelines,
            "vdatum_version": vv, "engine_version": ev,
            "base_datum": base[0] if base else None,
        })
    return out


def is_valid_vert_wkt(wkt: str) -> bool:
    """The reference's validity machine (vypercrs.py:849-858): the
    remark must carry regions, pipelines, the engine version and the
    base datum."""
    remarks = _search_string(wkt, "REMARK[")
    return bool(
        remarks
        and "regions" in remarks
        and "pipeline" in remarks
        and "vyperdatum" in remarks
        and "base_datum" in remarks
    )


# --------------------------------------------------------------------
# order-independent CRS accumulator (VyperPipelineCRS analog)
# --------------------------------------------------------------------

class PipelineCRS:
    """Mirror of the reference's ``VyperPipelineCRS`` assembly machine
    (vypercrs.py:665-870, exercised by tests/test_vypercrs.py:143-345):
    horizontal CRS, vertical datum, and regions arrive in ANY order and
    through any spec form (name / EPSG / WKT / tuple); the object
    becomes valid — and can emit the compound WKT — once all three are
    present."""

    def __init__(self, spec=None):
        self._horiz: str | None = None
        self._vert: str | None = None
        self._regions: list[str] = []
        if spec is not None:
            self.set_crs(spec)

    def set_crs(self, spec) -> None:
        from . import resolve

        if isinstance(spec, tuple):
            for part in spec:
                self.set_crs(part)
            return
        horiz, vert = resolve.resolve(spec)
        if horiz is not None:
            self._horiz = horiz
        if vert is not None:
            self._vert = vert
        if isinstance(spec, str) and "REMARK[" in spec:
            # a lineage-carrying WKT also brings its region list
            self._regions = parse_vert_wkt(spec)["regions"]

    def update_regions(self, regions) -> None:
        self._regions = list(regions)

    @property
    def horizontal(self) -> str | None:
        return self._horiz

    @property
    def vertical(self) -> str | None:
        return self._vert

    @property
    def regions(self) -> list[str]:
        return list(self._regions)

    @property
    def is_valid(self) -> bool:
        return bool(self._horiz and self._vert and self._regions)

    @property
    def is_height(self) -> bool | None:
        if self._vert is None:
            return None
        return pl.is_height(self._vert)

    def pipelines(self) -> list[str]:
        """Compiled PROJ lineage per accumulated region (root datum is
        the ellipsoid, as in the reference's datum definitions)."""
        out = []
        for rid in self._regions:
            r = catalog.REGION_BY_ID[rid]
            p = pl.compile_pipeline_string("ellipse", self._vert,
                                           rid, r.geoid)
            out.append(p if p is not None else "")
        return out

    def to_wkt(self) -> str:
        if self._vert is None:
            raise ValueError("no vertical datum set")
        return build_vert_wkt(self._vert, self._regions, self.pipelines(),
                              base_datum=self._horiz or "nad83s")

    def to_compound_wkt(self) -> str:
        if not self.is_valid:
            missing = [n for n, v in [("horizontal", self._horiz),
                                      ("vertical", self._vert),
                                      ("regions", self._regions)] if not v]
            raise ValueError(f"CRS incomplete, missing: {missing}")
        return build_compound_wkt(horiz_wkt_for_crs(self._horiz),
                                  self.to_wkt())


# --------------------------------------------------------------------
# engine integration: lineage CRS for a transform
# --------------------------------------------------------------------

def lineage_wkt(from_datum: str, to_datum: str,
                input_crs: str = "nad83s") -> str:
    """The output compound WKT for a catalog-wide transform — regions
    in catalog (precedence) order with their compiled pipelines, the
    job artifact a sink attaches to its output."""
    regions = []
    pipelines = []
    for r in catalog.REGIONS:
        p = pl.compile_pipeline_string(from_datum, to_datum, r.region_id, r.geoid)
        if p is not None:
            regions.append(r.region_id)
            pipelines.append(p)
    vert = build_vert_wkt(to_datum, regions, pipelines, base_datum=input_crs)
    return build_compound_wkt(horiz_wkt_for_crs(input_crs), vert)
