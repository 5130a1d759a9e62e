"""Training logger fan-out.

Re-design of the reference plugin logger (lib_shape_prior/logger/*): metric
streams go to JSONL + console (and TensorBoard if tensorboardX happens to be
installed — it is optional), per-sample reports to CSV, meshes to OBJ files.
Keyed by metric-name convention rather than the model's output_specs dict.
"""
from __future__ import annotations

import csv
import json
import logging
import os
import socket
import time
from typing import Dict, Optional

log = logging.getLogger("livingscenes_tpu")


def configure_logging(log_dir: Optional[str] = None, level=logging.INFO):
    """Hostname-tagged stream + optional file logging
    (init/config_utils.py:72-103)."""
    fmt = logging.Formatter(
        f"%(asctime)s|{socket.gethostname()}|%(levelname)s| %(message)s"
    )
    root = logging.getLogger()
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        root.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
        fh.setFormatter(fmt)
        root.addHandler(fh)


class TrainLogger:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._metrics_path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:  # optional dependency
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log_metrics(self, phase: str, step: int, metrics: Dict[str, float]):
        rec = {"phase": phase, "step": step, "time": time.time(), **metrics}
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{phase}/{k}", v, step)
        parts = " ".join(
            f"{k}={v:.5g}" for k, v in metrics.items() if isinstance(v, float)
        )
        log.info("[%s %d] %s", phase, step, parts)

    def log_histogram(self, phase: str, step: int, name: str, values):
        """Histogram logging (reference hist_logger.py role): percentile
        summary to JSONL (+ full histogram to TensorBoard if present)."""
        import numpy as _np

        v = _np.asarray(values).ravel()
        if v.size == 0:
            return
        qs = _np.percentile(v, [0, 5, 25, 50, 75, 95, 100]).tolist()
        rec = {
            "phase": phase, "step": step, "hist": name, "time": time.time(),
            "mean": float(v.mean()),
            "p0": qs[0], "p5": qs[1], "p25": qs[2], "p50": qs[3],
            "p75": qs[4], "p95": qs[5], "p100": qs[6],
        }
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_histogram(f"{phase}/{name}", v, step)

    def log_report(self, name: str, step: int, rows, mean_row=None):
        """Per-sample CSV report with a mean row prepended
        (xls_logger.py:61-78)."""
        path = os.path.join(self.log_dir, f"{name}_{step}.csv")
        if not rows:
            return
        keys = list(rows[0].keys())
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            if mean_row is not None:
                w.writerow(mean_row)
            for r in rows:
                w.writerow(r)

    def log_mesh(self, name: str, step: int, mesh):
        d = os.path.join(self.log_dir, "meshes")
        os.makedirs(d, exist_ok=True)
        mesh.export_obj(os.path.join(d, f"{name}_{step}.obj"))

    def log_video(self, name: str, step: int, frames, fps: int = 10):
        """Animated-GIF export of a frame sequence (the reference's video
        logger role, logger_meta/video_logger.py:13-100, minus its
        imageio/cv2 deps — PIL only).

        frames: (T, H, W, 3) uint8/float array or (T, 1/3, H, W)
        channel-first (the reference's layout); floats in [0, 1] are
        scaled. Single-channel frames get a grayscale->RGB expansion.
        Also pushed to TensorBoard as a video if a writer exists.
        """
        import numpy as _np

        v = _np.asarray(frames)
        if v.ndim != 4:
            raise ValueError(f"expected (T,H,W,3) or (T,C,H,W), got {v.shape}")
        if v.shape[1] in (1, 3) and v.shape[-1] not in (1, 3):
            v = v.transpose(0, 2, 3, 1)  # channel-first -> channel-last
        if v.shape[-1] == 1:
            v = _np.repeat(v, 3, axis=-1)
        if v.dtype != _np.uint8:
            v = (_np.clip(v, 0.0, 1.0) * 255).astype(_np.uint8)

        d = os.path.join(self.log_dir, "videos")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name}_{step}.gif")
        try:
            from PIL import Image
        except Exception:  # pragma: no cover - PIL is in the base image
            log.warning("PIL unavailable; skipping video log %s", name)
            return None
        imgs = [Image.fromarray(fr) for fr in v]
        imgs[0].save(
            path,
            save_all=True,
            append_images=imgs[1:],
            duration=max(int(1000 / fps), 1),
            loop=0,
        )
        if self._tb is not None:
            try:
                self._tb.add_video(
                    name, v.transpose(0, 3, 1, 2)[None], step, fps=fps
                )
            except Exception:
                pass
        return path
