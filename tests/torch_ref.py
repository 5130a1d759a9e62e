"""Load the mounted reference's torch modules for numeric parity tests.

The reference (/root/reference, read-only) depends on pytorch3d and pycg,
which are not installed. Both are stubbed here:

* pytorch3d.ops.knn_points / sample_farthest_points are re-implemented in
  pure torch with pytorch3d's documented semantics (exact kNN sorted
  ascending; FPS starting from index 0 with iterative min-distance argmax)
  — the same contract our JAX ops implement, so the parity tests compare
  the *networks*, with identical neighbor/sample selections on both sides.
* pycg is a visualization-only import (pose_estimation.py:8) — empty stub.

Nothing here is framework code; it exists so tests can run the reference
model as the golden implementation.
"""
from __future__ import annotations

import collections
import sys
import types

REFERENCE_ROOT = "/root/reference"

_KNN = collections.namedtuple("KNN", ["dists", "idx", "knn"])


def _install_pytorch3d_stub():
    import torch

    if "pytorch3d" in sys.modules:
        return

    def knn_points(p1, p2, K, lengths1=None, lengths2=None,
                   return_nn=False, return_sorted=True, **_):
        # p1: (B, N, D) queries; p2: (B, M, D) points. Exact squared
        # distances (no matmul trick — the straightforward formula is the
        # golden semantics), k smallest sorted ascending.
        d2 = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)
        dists, idx = torch.topk(d2, K, dim=-1, largest=False, sorted=True)
        nn = None
        if return_nn:
            nn = torch.gather(
                p2[:, None].expand(-1, p1.shape[1], -1, -1),
                2,
                idx[..., None].expand(-1, -1, -1, p2.shape[-1]),
            )
        return _KNN(dists, idx, nn)

    def sample_farthest_points(points, lengths=None, K=50,
                               random_start_point=False):
        # Iterative FPS: start at index 0 (pytorch3d default), then
        # argmax of the running min-distance field (first occurrence wins).
        B, N, _ = points.shape
        K = int(K)
        idx = torch.zeros(B, K, dtype=torch.long)
        if random_start_point:
            idx[:, 0] = torch.randint(0, N, (B,))
        min_d = torch.full((B, N), float("inf"), dtype=points.dtype)
        for i in range(1, K):
            last = points.gather(
                1, idx[:, i - 1 : i, None].expand(-1, -1, points.shape[-1])
            )
            d = ((points - last) ** 2).sum(-1)
            min_d = torch.minimum(min_d, d)
            idx[:, i] = min_d.argmax(-1)
        sampled = points.gather(
            1, idx[..., None].expand(-1, -1, points.shape[-1])
        )
        return sampled, idx

    pkg = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")
    knn_mod = types.ModuleType("pytorch3d.ops.knn")
    knn_mod.knn_points = knn_points
    ops.knn = knn_mod
    ops.knn_points = knn_points
    ops.sample_farthest_points = sample_farthest_points
    pkg.ops = ops
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.ops"] = ops
    sys.modules["pytorch3d.ops.knn"] = knn_mod


def _install_pycg_stub():
    if "pycg" in sys.modules:
        return
    pycg = types.ModuleType("pycg")
    pycg.vis = types.ModuleType("pycg.vis")
    sys.modules["pycg"] = pycg
    sys.modules["pycg.vis"] = pycg.vis


def load_reference_modules():
    """Import and return the reference's production network modules:
    (vec_dgcnn_atten, deepsdf_decoder). Raises ImportError if torch is
    unavailable."""
    _install_pytorch3d_stub()
    for p in (
        f"{REFERENCE_ROOT}/lib_shape_prior/core/lib/vec_sim3",
        f"{REFERENCE_ROOT}/lib_shape_prior/core/lib/implicit_func",
    ):
        if p not in sys.path:
            sys.path.insert(0, p)
    import deepsdf_decoder  # noqa: F401
    import vec_dgcnn_atten  # noqa: F401

    return vec_dgcnn_atten, deepsdf_decoder


def load_reference_pose_estimation():
    """Import the reference's lib_more.pose_estimation (Kabsch etc.)."""
    _install_pycg_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from lib_more import pose_estimation  # noqa: F401

    return pose_estimation
