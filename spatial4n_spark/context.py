"""Engine context: the SpatialContext / SpatialContextFactory analog.

Mirrors Context/SpatialContext.cs:40-207 (geo flag, calculator, world
bounds, normalization/validation) and the string-map factory
Context/SpatialContextFactory.cs:34-293 (keys `geo`, `distCalculator`
in {haversine, lawOfCosines, vincentySphere, cartesian, cartesian^2},
`worldBounds` as a readable shape string, `normWrapLongitude`). On a
cluster the context is a tiny frozen value captured in UDF closures —
the broadcast-config pattern; kernels stay pure functions of it.
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

CALCULATORS = ("haversine", "lawOfCosines", "vincentySphere",
               "cartesian", "cartesian^2")


@dataclass(frozen=True)
class SpatialEngineContext:
    geo: bool = True
    calculator: str = "haversine"
    # (minx, maxx, miny, maxy); geo default = world (SpatialContext.cs:107-110)
    world_bounds: tuple = (-180.0, 180.0, -90.0, 90.0)
    norm_wrap_longitude: bool = False
    # NtsSpatialContextFactory.cs:73-75 analogs (polygon parsing)
    dateline_rule: str = "width180"     # none | width180 | ccwRect
    validation_rule: str = "error"      # none | error | repairConvexHull
    #                                   # | repairBuffer0
    # union overlapping MULTIPOLYGON members at construction
    # (NtsSpatialContext.IsAllowMultiOverlap :84, factory key :52,
    # NtsGeometry.cs:64-94 UnionGeometryCollection)
    allow_multi_overlap: bool = False
    # prepared-geometry analog (NtsWktShapeParser.IsAutoIndex, factory
    # key NtsSpatialContextFactory.cs:47-48,76,95; NtsGeometry.Index()
    # :124-134): force the closure-refine join path — the engine's
    # PreparedGeometry — instead of leaving it to the join planner's
    # broadcast heuristic. Plumbed via JoinPlan.auto_index.
    auto_index: bool = False
    # precision model (NtsSpatialContext.NormX/Y snap, :91-101; factory
    # keys precisionModel/precisionScale, NtsSpatialContextFactory.cs
    # :55-58,101-127)
    precision_model: str = "floating"   # floating | floating_single | fixed
    precision_scale: float | None = None
    # wktShapeParserClass analog (NtsSpatialContextFactory.cs:63-81,
    # NtsWKTReaderShapeParser.cs): "default" = the spatial4n grammar;
    # "ntsReader" = the alt reader (ISO WKT only, per-vertex lon wrap
    # + bounds verify — see kernels.wkt.parse_shape_ntsreader)
    wkt_parser: str = "default"         # default | ntsReader

    # ---- factory (SpatialContextFactory.MakeSpatialContext analog) ----
    @classmethod
    def from_args(cls, args: dict) -> "SpatialEngineContext":
        geo = str(args.get("geo", "true")).lower() != "false"
        ctx = cls(geo=geo)
        if not geo:
            ctx = replace(ctx, calculator="cartesian",
                          world_bounds=(-180.0, 180.0, -90.0, 90.0))
        calc = args.get("distCalculator")
        if calc is not None:
            match = [c for c in CALCULATORS if c.lower() == str(calc).lower()]
            if not match:
                raise ValueError(f"Unknown calculator: {calc}")
            ctx = replace(ctx, calculator=match[0])
        wb = args.get("worldBounds")
        if wb is not None:
            from .kernels.wkt import parse_shape
            rec = parse_shape(wb, geo=geo)
            ctx = replace(ctx, world_bounds=(rec["minx"], rec["maxx"],
                                             rec["miny"], rec["maxy"]))
        if str(args.get("normWrapLongitude", "")).lower() == "true":
            ctx = replace(ctx, norm_wrap_longitude=True)
        if str(args.get("allowMultiOverlap", "")).lower() == "true":
            ctx = replace(ctx, allow_multi_overlap=True)
        if str(args.get("autoIndex", "")).lower() == "true":
            ctx = replace(ctx, auto_index=True)
        dl = args.get("datelineRule")
        if dl is not None:
            from .kernels.wkt import DATELINE_RULES
            match = [r for r in DATELINE_RULES
                     if r.lower() == str(dl).lower()]
            if not match:
                raise ValueError(f"Unknown dateline rule: {dl}")
            ctx = replace(ctx, dateline_rule=match[0])
        vr = args.get("validationRule")
        if vr is not None:
            from .kernels.wkt import VALIDATION_RULES
            match = [r for r in VALIDATION_RULES
                     if r.lower() == str(vr).lower()]
            if not match:
                raise ValueError(f"Unknown validation rule: {vr}")
            ctx = replace(ctx, validation_rule=match[0])
        wp = args.get("wktShapeParserClass")
        if wp is not None:
            names = {"default": "default",
                     "ntsreader": "ntsReader",
                     "ntswktreadershapeparser": "ntsReader"}
            key = names.get(str(wp).lower())
            if key is None:
                raise ValueError(f"Unknown WKT shape parser: {wp}")
            ctx = replace(ctx, wkt_parser=key)
        pm = args.get("precisionModel")
        ps = args.get("precisionScale")
        if ps is not None and (pm is None or str(pm) != "fixed"):
            # mirrors NtsSpatialContextFactory.cs:104-107
            raise ValueError(
                "Since precisionScale was specified; precisionModel must "
                f"be 'fixed' but got: {pm}")
        if pm is not None:
            from .kernels.wkt import PRECISION_MODELS
            match = [m for m in PRECISION_MODELS
                     if m.lower() == str(pm).lower()]
            if not match:
                raise ValueError(f"Unknown precision model: {pm}")
            ctx = replace(ctx, precision_model=match[0],
                          precision_scale=(float(ps) if ps is not None
                                           else None))
            ctx.snap_fn()  # validate model/scale combination eagerly
        return ctx

    def snap_fn(self):
        """The coordinate quantizer for this context (None = floating)."""
        from .kernels.wkt import make_snap
        return make_snap(self.precision_model, self.precision_scale)

    # ---- WKT parse under this context's rules ----
    def parse_wkt(self, wkt: str) -> dict:
        if self.wkt_parser == "ntsReader":
            from .kernels.wkt import parse_shape_ntsreader
            return parse_shape_ntsreader(
                wkt, geo=self.geo,
                dateline_rule=self.dateline_rule,
                validation_rule=self.validation_rule,
                snap=self.snap_fn(),
                allow_multi_overlap=self.allow_multi_overlap,
                norm_wrap_longitude=self.norm_wrap_longitude,
                world_bounds=self.world_bounds)
        from .kernels.wkt import parse_shape
        return parse_shape(wkt, geo=self.geo,
                           dateline_rule=self.dateline_rule,
                           validation_rule=self.validation_rule,
                           snap=self.snap_fn(),
                           allow_multi_overlap=self.allow_multi_overlap)

    # ---- normalization / validation (SpatialContext.cs:172-207) ----
    def norm_x(self, x):
        x = np.asarray(x, dtype=np.float64)
        if self.geo and self.norm_wrap_longitude:
            from .kernels.normalize import norm_lon_deg
            x = norm_lon_deg(x)
        snap = self.snap_fn()  # NtsSpatialContext.NormX :91-95
        return snap(x) if snap is not None else x

    def norm_y(self, y):
        y = np.asarray(y, dtype=np.float64)
        snap = self.snap_fn()  # NtsSpatialContext.NormY :97-101
        return snap(y) if snap is not None else y

    def verify_x(self, x):
        lo, hi = self.world_bounds[0], self.world_bounds[1]
        bad = (np.asarray(x, dtype=np.float64) < lo) | (np.asarray(x) > hi)
        if bad.any():
            raise ValueError(f"Bad X value: outside [{lo}, {hi}]")

    def verify_y(self, y):
        lo, hi = self.world_bounds[2], self.world_bounds[3]
        bad = (np.asarray(y, dtype=np.float64) < lo) | (np.asarray(y) > hi)
        if bad.any():
            raise ValueError(f"Bad Y value: outside [{lo}, {hi}]")

    # ---- calculator dispatch (SpatialContext.DistCalc analog) ----
    def distance(self, x1, y1, x2, y2):
        from .kernels.distance import cartesian_distance, geo_distance_deg
        if self.calculator == "cartesian":
            return cartesian_distance(x1, y1, x2, y2)
        if self.calculator == "cartesian^2":
            return cartesian_distance(x1, y1, x2, y2, squared=True)
        return geo_distance_deg(x1, y1, x2, y2, self.calculator)

    # ---- shape reading (SpatialContext.ReadShape: legacy then WKT) ----
    def read_shape(self, text: str) -> dict:
        from .kernels.wkt import parse_legacy, parse_shape
        try:
            return parse_legacy(text, geo=self.geo)
        except Exception:
            return parse_shape(text, geo=self.geo)


GEO = SpatialEngineContext()
