"""Hierarchical YAML config system.

Re-design of the reference's init/ package (lib_shape_prior/init/
config_utils.py:7-54 + __init__.py:11-32): YAML files with `inherit_from`
chains merged recursively under a default config, then dotted-key CLI
overrides. Side-effectful startup (interactive confirm, CUDA_VISIBLE_DEVICES)
is intentionally dropped; log-dir management and config backup are kept so
checkpoints stay self-describing (the property load_ckpt_from_log relies on,
model_utils.py:276-278).
"""
from __future__ import annotations

import copy
import os
import shutil
from typing import Any, Dict, List, Optional

import yaml


def update_recursive(dst: Dict, src: Dict) -> Dict:
    """Deep-merge src into dst (config_utils.py:38-54 semantics)."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            update_recursive(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


def load_config(path: str, default_path: Optional[str] = None) -> Dict:
    """Load a YAML config resolving its `inherit_from` chain."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    inherit = cfg.pop("inherit_from", None)
    if inherit:
        if not os.path.isabs(inherit):
            inherit = os.path.join(os.path.dirname(path), inherit)
        base = load_config(inherit, default_path)
    elif default_path and os.path.abspath(default_path) != os.path.abspath(path):
        base = load_config(default_path)
    else:
        base = {}
    return update_recursive(base, cfg)


def apply_overrides(cfg: Dict, overrides: List[str]) -> Dict:
    """Apply 'a.b.c=value' CLI overrides (values parsed as YAML)."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def cfg_with_default(cfg: Dict, key_list: List[str], default: Any) -> Any:
    """Nested get with default (core/models/utils/misc.py:4)."""
    node = cfg
    for k in key_list:
        if isinstance(node, dict) and k in node:
            node = node[k]
        else:
            return default
    return node


def prepare_log_dir(cfg: Dict, config_path: Optional[str] = None) -> str:
    """Create the run directory, renaming collisions, and back up the
    resolved config (init/post_config.py:60-123 without interactivity)."""
    log_dir = cfg_with_default(cfg, ["logging", "log_dir"], "log/run")
    if os.path.exists(log_dir) and os.listdir(log_dir):
        i = 1
        while os.path.exists(f"{log_dir}_bck{i}"):
            i += 1
        shutil.move(log_dir, f"{log_dir}_bck{i}")
    os.makedirs(log_dir, exist_ok=True)
    backup = os.path.join(log_dir, "files_backup")
    os.makedirs(backup, exist_ok=True)
    with open(os.path.join(backup, "resolved_config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    if config_path and os.path.exists(config_path):
        shutil.copy(config_path, backup)
    return log_dir


def load_run_config(log_dir: str) -> Dict:
    """Recover the resolved config from a run directory (the
    load_ckpt_from_log pattern, model_utils.py:267-283)."""
    path = os.path.join(log_dir, "files_backup", "resolved_config.yaml")
    with open(path) as f:
        return yaml.safe_load(f)
