"""Measure the reference's own torch pipeline on this machine's CPU.

Grounds bench.py's vs_baseline (VERDICT round-1 item 3): runs the mounted
reference's actual production modules — VecDGCNN_att encoder
(vec_dgcnn_atten.py:22-252) per instance exactly as eval_3rscan does
(model_utils.py:199-215 loops instances with B=1), sequential matching
(matcher_new.py:109-140) and per-pair Kabsch (pose_estimation.py:29-103) —
for one synthetic scene pair (8 objects x 2 scans x 1024 pts) and writes
the measured scene-pairs/sec to docs/reference_baseline_measured.json.

Exclusions that BIAS THE COMPARISON IN THE REFERENCE'S FAVOR (the measured
number overstates what the reference achieves on this host):
  * pytorch3d FPS and ICP are not installed; FPS preprocessing and the
    100-iteration ICP refinement are skipped entirely.
  * kNN inside the encoder uses a pure-torch stub (tests/torch_ref.py)
    rather than pytorch3d's C++ kernels — same O(N^2) math, comparable
    cost on CPU.

Run: python scripts/reference_baseline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import torch

from torch_ref import load_reference_modules, load_reference_pose_estimation

ENC_KW = dict(
    c_dim=256,
    num_layers=7,
    feat_dim=[32, 32, 64, 64, 128, 256, 512],
    down_sample_layers=[2, 4, 5],
    down_sample_factor=[2, 4, 4],
    atten_start_layer=2,
    atten_multi_head_c=16,
    use_res_global_conv=True,
    res_global_start_layer=2,
    num_knn=16,
    scale_factor=64000.0,
    leak_neg_slope=0.2,
    use_dg=True,
    center_pred=True,
    center_pred_scale=True,
)

N_OBJ, N_PTS = 8, 1024


def main():
    vec_dgcnn_atten, _ = load_reference_modules()
    pose_est = load_reference_pose_estimation()
    sys.path.insert(0, "/root/reference")
    from lib_more import matcher_new

    torch.manual_seed(0)
    enc = vec_dgcnn_atten.VecDGCNN_att(**ENC_KW).float().eval()

    rng = np.random.default_rng(0)
    scans = torch.from_numpy(
        rng.normal(size=(2 * N_OBJ, 3, N_PTS)).astype(np.float32)
    )

    def one_scene_pair():
        codes = []
        with torch.no_grad():
            # per-instance B=1 encoder forwards, as model_utils.encode_fps
            for i in range(2 * N_OBJ):
                pc = scans[i : i + 1]
                centroid = pc.mean(-1)
                centered = pc - centroid[..., None]
                dist = torch.cdist(
                    centered.transpose(-1, -2), centered.transpose(-1, -2)
                )
                scale_0 = dist.view(1, -1).topk(5, dim=-1)[0].mean(-1)
                out = enc(centered / scale_0[:, None, None])
                codes.append(out)
            z_inv_ref = torch.cat([c[3] for c in codes[:N_OBJ]])
            z_inv_res = torch.cat([c[3] for c in codes[N_OBJ:]])
            matches = matcher_new.sequential_matcher(z_inv_ref, z_inv_res)
            for i in range(N_OBJ):
                f1 = codes[i][2][0] + 0.0  # z_so3 (C, 3)
                f2 = codes[N_OBJ + i][2][0]
                pose_est.kabsch_transformation_estimation(
                    f1[None], f2[None]
                )
        return matches

    t0 = time.perf_counter()
    one_scene_pair()
    dt = time.perf_counter() - t0

    result = {
        "pairs_per_sec_cpu": round(1.0 / dt, 4),
        "seconds_per_pair": round(dt, 2),
        "host": f"{os.cpu_count()} cpu core(s), torch {torch.__version__}",
        "notes": (
            "reference torch modules, per-instance loop as eval_3rscan; "
            "FPS preprocessing and 100-it ICP EXCLUDED (pytorch3d absent) "
            "- the true reference CPU throughput is lower"
        ),
    }
    out_path = os.path.join(REPO, "docs", "reference_baseline_measured.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
