"""Binary shape codec — byte-compatible with the reference.

Layout (Io/BinaryCodec.cs:40-57, 158-234): one type byte
{Point=1, Rectangle=2, Circle=3, Collection=4} followed by IEEE-754
doubles in C# BinaryWriter order (little-endian): point = x,y; rect =
minX,maxX,minY,maxY; circle = center x,y then radius; collection =
members-type byte (0 = heterogeneous) + int32 count + nested encoded
shapes. The engine's at-rest format is Parquet (the shape struct IS
the decoded form); this codec exists for golden-file parity and
exchange with reference implementations.
"""
from __future__ import annotations

import struct

from .wkt import (KIND_CIRCLE, KIND_COLLECTION, KIND_POINT, KIND_RECT,
                  WktParseError, _empty, _mk_circle, _mk_point, _mk_rect)

TYPE_POINT = 1
TYPE_RECT = 2
TYPE_CIRCLE = 3
TYPE_COLLECTION = 4

_KIND_TO_TYPE = {KIND_POINT: TYPE_POINT, KIND_RECT: TYPE_RECT,
                 KIND_CIRCLE: TYPE_CIRCLE, KIND_COLLECTION: TYPE_COLLECTION}


def write_shape(rec: dict) -> bytes:
    """Shape record -> reference-layout bytes."""
    kind = rec["kind"]
    t = _KIND_TO_TYPE.get(kind)
    if t is None:
        raise WktParseError(f"unsupported shape kind for binary codec: {kind}")
    if t == TYPE_POINT:
        return struct.pack("<Bdd", t, rec["x"], rec["y"])
    if t == TYPE_RECT:
        return struct.pack("<Bdddd", t, rec["minx"], rec["maxx"],
                           rec["miny"], rec["maxy"])
    if t == TYPE_CIRCLE:
        return struct.pack("<Bddd", t, rec["x"], rec["y"], rec["radius"])
    members = rec.get("members") or []
    out = struct.pack("<BBi", t, 0, len(members))
    for m in members:
        out += write_shape(m)
    return out


def read_shape(buf: bytes, geo: bool = True) -> dict:
    rec, off = _read_at(buf, 0, geo)
    if off != len(buf):
        raise WktParseError(f"trailing bytes after shape: {len(buf) - off}")
    return rec


def _read_at(buf: bytes, off: int, geo: bool) -> tuple[dict, int]:
    t = buf[off]
    off += 1
    if t == TYPE_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return _mk_point(x, y), off + 16
    if t == TYPE_RECT:
        minx, maxx, miny, maxy = struct.unpack_from("<dddd", buf, off)
        return _mk_rect(minx, maxx, miny, maxy, geo), off + 32
    if t == TYPE_CIRCLE:
        x, y, r = struct.unpack_from("<ddd", buf, off)
        return _mk_circle(x, y, r, geo), off + 24
    if t == TYPE_COLLECTION:
        mtype, size = struct.unpack_from("<Bi", buf, off)
        off += 5
        if mtype != 0:
            raise WktParseError(f"unsupported collection member type {mtype}")
        members = []
        for _ in range(size):
            m, off = _read_at(buf, off, geo)
            members.append(m)
        d = _empty(KIND_COLLECTION)
        d["members"] = members
        if members:
            from .extent import union_bboxes
            lo, hi, mny, mxy = union_bboxes(
                [(m["minx"], m["maxx"], m["miny"], m["maxy"]) for m in members])
            d.update(minx=lo, maxx=hi, miny=mny, maxy=mxy)
        return d, off
    raise WktParseError(f"Unsupported shape byte {t}")
