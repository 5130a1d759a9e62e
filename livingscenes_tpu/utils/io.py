"""Host IO utilities: PLY point/mesh loading, JSON/YAML/txt helpers.

Replaces the reference's point_cloud_utils / trimesh IO dependencies with a
self-contained reader for the formats the benchmarks need
(pointcloud.instances.align.ply in 3RScan, mesh PLY ground truths).
"""
from __future__ import annotations

import json
from typing import List, Optional, Tuple

import numpy as np
import yaml

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def load_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Load vertices (V, 3) and faces (F, 3) or None from a PLY file.

    Supports ascii and binary_little_endian, scalar vertex properties and
    uchar-count int-index face lists (the layouts 3RScan / common tooling
    emit)."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header_lines.append(line)
            if line == "end_header":
                break

        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) or ("__list__", ...)])
        for line in header_lines:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property" and elements:
                if parts[1] == "list":
                    elements[-1][2].append(
                        ("__list__", _PLY_DTYPES[parts[2]], _PLY_DTYPES[parts[3]], parts[4])
                    )
                else:
                    elements[-1][2].append((parts[2], _PLY_DTYPES[parts[1]]))

        verts = None
        faces = None
        if fmt == "ascii":
            for name, count, props in elements:
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    names = [p[0] for p in props]
                    arr = np.array(rows, dtype=np.float64)
                    xyz = [names.index(c) for c in ("x", "y", "z")]
                    verts = arr[:, xyz].astype(np.float32)
                elif name == "face":
                    faces = np.array(
                        [r[1:4] for r in rows], dtype=np.int64
                    )
        elif fmt == "binary_little_endian":
            for name, count, props in elements:
                if name == "vertex":
                    dtype = np.dtype(
                        [(p[0], "<" + p[1]) for p in props if p[0] != "__list__"]
                    )
                    data = np.frombuffer(f.read(dtype.itemsize * count), dtype)
                    verts = np.stack(
                        [data["x"], data["y"], data["z"]], axis=-1
                    ).astype(np.float32)
                elif name == "face":
                    lst = props[0]
                    cdt = np.dtype("<" + lst[1])
                    idt = np.dtype("<" + lst[2])
                    out = np.empty((count, 3), np.int64)
                    for i in range(count):
                        n = int(np.frombuffer(f.read(cdt.itemsize), cdt)[0])
                        idx = np.frombuffer(f.read(idt.itemsize * n), idt)
                        out[i] = idx[:3]
                    faces = out
                else:  # skip unknown fixed-size elements
                    dtype = np.dtype(
                        [(p[0], "<" + p[1]) for p in props if p[0] != "__list__"]
                    )
                    f.read(dtype.itemsize * count)
        else:
            raise ValueError(f"unsupported ply format {fmt}")
    return verts, faces


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def load_yaml(path: str):
    with open(path) as f:
        return yaml.safe_load(f)


def read_list_from_txt(path: str) -> List[str]:
    with open(path) as f:
        return [l.strip() for l in f.read().splitlines() if l.strip()]
