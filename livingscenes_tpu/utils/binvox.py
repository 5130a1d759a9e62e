"""binvox voxel-grid IO (reference binvox_rw.py role).

Reads/writes the run-length-encoded .binvox format
(https://www.patrickmin.com/binvox/binvox.html): header with dims /
translate / scale, then (value, count) byte pairs in x-major order.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class VoxelGrid:
    data: np.ndarray  # (nx, ny, nz) bool
    translate: tuple = (0.0, 0.0, 0.0)
    scale: float = 1.0

    @property
    def resolution(self):
        return self.data.shape


def read_binvox(path: str) -> VoxelGrid:
    with open(path, "rb") as f:
        line = f.readline().strip()
        if not line.startswith(b"#binvox"):
            raise ValueError("not a binvox file")
        dims, translate, scale = None, (0.0, 0.0, 0.0), 1.0
        while True:
            line = f.readline().strip()
            if line.startswith(b"data"):
                break
            tok = line.split()
            if tok[0] == b"dim":
                dims = tuple(int(x) for x in tok[1:4])
            elif tok[0] == b"translate":
                translate = tuple(float(x) for x in tok[1:4])
            elif tok[0] == b"scale":
                scale = float(tok[1])
        raw = np.frombuffer(f.read(), np.uint8)
    values = raw[0::2]
    counts = raw[1::2]
    flat = np.repeat(values.astype(bool), counts)
    # binvox stores x-major, z fastest within a y column: index = x*wxh + z*w + y
    nx, ny, nz = dims
    grid = flat.reshape(nx, nz, ny).transpose(0, 2, 1)
    return VoxelGrid(np.ascontiguousarray(grid), translate, scale)


def write_binvox(path: str, grid: VoxelGrid) -> None:
    nx, ny, nz = grid.data.shape
    flat = np.ascontiguousarray(
        grid.data.transpose(0, 2, 1)
    ).reshape(-1).astype(np.uint8)
    # RLE with max run 255
    out = bytearray()
    i = 0
    n = len(flat)
    while i < n:
        v = flat[i]
        run = 1
        while i + run < n and flat[i + run] == v and run < 255:
            run += 1
        out.append(int(v))
        out.append(run)
        i += run
    with open(path, "wb") as f:
        f.write(b"#binvox 1\n")
        f.write(f"dim {nx} {ny} {nz}\n".encode())
        f.write(
            ("translate %g %g %g\n" % tuple(grid.translate)).encode()
        )
        f.write(f"scale {grid.scale:g}\n".encode())
        f.write(b"data\n")
        f.write(bytes(out))
