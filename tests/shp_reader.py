"""Minimal ESRI shapefile polygon reader — test fixture loader only.

Written from the public shapefile spec (ESRI whitepaper, 1998): 100-byte
header (big-endian file code / length, little-endian version / shape type),
then records of [record header: 8 bytes BE][shape type: 4 LE][polygon:
bbox 4 doubles, numparts int, numpoints int, parts int[], points (x,y)
doubles]. Only shape type 5 (Polygon) is supported.
"""

from __future__ import annotations

import struct


def read_polygons(path: str) -> list[list[list[tuple[float, float]]]]:
    """Returns per-record list of rings; each ring is a closed vertex list."""
    data = open(path, "rb").read()
    shape_type = struct.unpack("<i", data[32:36])[0]
    assert shape_type == 5, f"only polygon shapefiles supported, got {shape_type}"
    pos = 100
    out = []
    while pos < len(data):
        (_, content_len) = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        rec_end = pos + content_len * 2
        st = struct.unpack("<i", data[pos : pos + 4])[0]
        if st == 0:  # null shape
            out.append([])
            pos = rec_end
            continue
        num_parts, num_points = struct.unpack("<ii", data[pos + 36 : pos + 44])
        parts = struct.unpack(f"<{num_parts}i", data[pos + 44 : pos + 44 + 4 * num_parts])
        pts_off = pos + 44 + 4 * num_parts
        flat = struct.unpack(f"<{num_points * 2}d", data[pts_off : pts_off + 16 * num_points])
        points = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
        rings = []
        for pi, start in enumerate(parts):
            end = parts[pi + 1] if pi + 1 < num_parts else num_points
            rings.append(points[start:end])
        out.append(rings)
        pos = rec_end
    return out


def read_gal(path: str) -> dict[int, set[int]]:
    """Parse a GAL neighbor-list file (header n, then per-node 'id k' + list)."""
    lines = [ln.split() for ln in open(path).read().strip().splitlines()]
    i = 1
    nbrs: dict[int, set[int]] = {}
    while i < len(lines):
        node, k = int(lines[i][0]), int(lines[i][1])
        if k > 0:
            nbrs[node] = {int(t) for t in lines[i + 1]}
            i += 2
        else:
            nbrs[node] = set()
            i += 1 if len(lines[i]) == 2 else 2
    return nbrs
