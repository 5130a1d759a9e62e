"""Torch checkpoint conversion.

Converts the reference's released torch checkpoints
(weights/checkpoint/*.pt, layout per model_utils.py:118-127: keys
"network_dict.{encoder,decoder}.<module path>") into this framework's flax
param pytrees — making the switch from the reference mechanical.

Name mapping (reference torch module -> flax):
  V_list.{i}.lin.weight            -> encoder/V_{i}/lin/weight
  V_list.{i}.act.lin_dir.weight    -> encoder/V_{i}/act/lin_dir/weight
  Q_list/K_list likewise           -> Q_{i}/K_{i}
  global_conv_list.{j}.*           -> global_conv_{j + res_global_start}/*
  conv_c.*, fc_inv.weight, fc_center.{fc0,lin1,shortcut,act2}.* -> same names
  decoder lin{i}.weight_v/weight_g/bias -> decoder/lin{i}/{v,g,b}
           (v transposed to (in, out); torch weight-norm is per-out-row,
            ours per-column of the transposed matrix — identical function)
  decoder lin{last}.weight/bias    -> decoder/lin{last}/{kernel,bias}

VecLinear weights keep the torch (out, in) orientation (nn/vec_layers.py
uses the same layout), so only torch.nn.Linear tensors are transposed.
"""
from __future__ import annotations

import logging
from typing import Dict

import numpy as np

log = logging.getLogger(__name__)


def _strip_prefixes(state_dict: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Split a raw checkpoint into encoder/decoder sub-dicts with local
    names, accepting either training-layout keys
    ('network_dict.encoder.<...>') or pre-stripped ones ('<...>' plus a
    {'encoder': ..., 'decoder': ...} nesting convention)."""
    enc, dec, cls, pe = {}, {}, {}, {}
    for k, v in state_dict.items():
        parts = k.split(".")
        if "encoder" in parts:
            idx = parts.index("encoder")
            enc[".".join(parts[idx + 1 :])] = v
        elif "decoder" in parts:
            idx = parts.index("decoder")
            dec[".".join(parts[idx + 1 :])] = v
        elif "cls_head" in parts:
            idx = parts.index("cls_head")
            cls[".".join(parts[idx + 1 :])] = v
        elif "pe_projector" in parts:
            idx = parts.index("pe_projector")
            pe[".".join(parts[idx + 1 :])] = v
        else:
            log.warning("unrecognized checkpoint key %s", k)
    return {"encoder": enc, "decoder": dec, "cls_head": cls,
            "pe_projector": pe}


def _to_np(v, dtype=np.float32) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype)


def _convert_encoder(
    sd: Dict[str, np.ndarray], res_global_start_layer: int = 2,
    dtype=np.float32,
) -> Dict:
    out: Dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _to_np(value, dtype)

    for k, v in sd.items():
        parts = k.split(".")
        head = parts[0]
        if head in ("V_list", "Q_list", "K_list"):
            i = int(parts[1])
            name = f"{head[0]}_{i}"
            put([name] + parts[2:], v)
        elif head == "global_conv_list":
            j = int(parts[1])
            name = f"global_conv_{j + res_global_start_layer}"
            put([name] + parts[2:], v)
        elif head in ("conv_c", "fc_inv", "fc_center", "fc_O"):
            put(parts, v)
        else:
            log.warning("unmapped encoder key %s", k)
    return out


def _convert_decoder(sd: Dict[str, np.ndarray], dtype=np.float32) -> Dict:
    out: Dict = {}
    layers = sorted(
        {k.split(".")[0] for k in sd if k.startswith("lin")},
        key=lambda s: int(s[3:]),
    )
    for name in layers:
        wn_v = sd.get(f"{name}.weight_v")
        if wn_v is None:
            # torch >= 2.1 parametrized weight-norm layout
            wn_v = sd.get(f"{name}.parametrizations.weight.original1")
            wn_g = sd.get(f"{name}.parametrizations.weight.original0")
        else:
            wn_g = sd.get(f"{name}.weight_g")
        bias = sd.get(f"{name}.bias")
        if wn_v is not None:
            out[name] = {
                "v": _to_np(wn_v, dtype).T,
                "g": _to_np(wn_g, dtype).reshape(-1),
                "b": _to_np(bias, dtype),
            }
        else:
            out[name] = {
                "kernel": _to_np(sd[f"{name}.weight"], dtype).T,
                "bias": _to_np(bias, dtype),
            }
    return out


def _convert_cls_head(sd: Dict[str, np.ndarray], dtype=np.float32) -> Dict:
    """torch nn.Sequential(Linear, Sigmoid, Linear, Sigmoid, Linear)
    indices {0, 2, 4} -> flax lin{0, 1, 2} (model_utils.py:131-146)."""
    out: Dict = {}
    for k, v in sd.items():
        idx, kind = k.split(".")
        name = f"lin{int(idx) // 2}"
        arr = _to_np(v, dtype)
        if kind == "weight":
            out.setdefault(name, {})["kernel"] = arr.T
        else:
            out.setdefault(name, {})["bias"] = arr
    return out


def torch_state_dict_to_params(
    state_dict: Dict[str, np.ndarray],
    res_global_start_layer: int = 2,
    dtype=np.float32,
) -> Dict:
    """Full conversion: raw torch state dict -> {'encoder':..., 'decoder':...}
    (+ 'cls_head' when the checkpoint carries one). `dtype` controls the
    parameter precision (float64 for tight parity testing)."""
    split = _strip_prefixes(state_dict)
    params = {
        "encoder": _convert_encoder(
            split["encoder"], res_global_start_layer, dtype
        ),
        "decoder": _convert_decoder(split["decoder"], dtype),
    }
    if split["cls_head"]:
        params["cls_head"] = _convert_cls_head(split["cls_head"], dtype)
    if split["pe_projector"]:
        # VecLinear weight keeps the torch (out, in[-1]) orientation
        params["pe_projector"] = {
            k: _to_np(v, dtype) for k, v in split["pe_projector"].items()
        }
    return params


def load_torch_checkpoint(path: str, res_global_start_layer: int = 2) -> Dict:
    """Load a reference .pt checkpoint file (training layout with
    'model_state_dict', model_utils.py:118-120) and convert."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model_state_dict", payload)
    return torch_state_dict_to_params(sd, res_global_start_layer)


# ---------------------------------------------------------------------------
# Reverse direction (round-trip tests + exporting to reference tooling)
# ---------------------------------------------------------------------------

def params_to_torch_state_dict(
    params: Dict, res_global_start_layer: int = 2
) -> Dict[str, np.ndarray]:
    """Export flax params to the reference's training-layout key names."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        name = path[0]
        rest = path[1:]
        arr = np.asarray(node)
        if name.startswith(("V_", "Q_", "K_")) and name[2:].isdigit():
            torch_name = f"{name[0]}_list.{name[2:]}." + ".".join(rest)
        elif name.startswith("global_conv_"):
            j = int(name.split("_")[-1]) - res_global_start_layer
            torch_name = f"global_conv_list.{j}." + ".".join(rest)
        elif name.startswith("lin") and rest and rest[0] in ("v", "g", "b", "kernel", "bias"):
            kind = rest[0]
            if kind == "v":
                torch_name, arr = f"{name}.weight_v", arr.T
            elif kind == "g":
                torch_name, arr = f"{name}.weight_g", arr.reshape(-1, 1)
            elif kind == "b":
                torch_name = f"{name}.bias"
            elif kind == "kernel":
                torch_name, arr = f"{name}.weight", arr.T
            else:
                torch_name = f"{name}.bias"
        else:
            torch_name = ".".join(path)
        out[prefix + torch_name] = arr

    for comp in ("encoder", "decoder"):
        prefix = f"network_dict.{comp}."
        walk(params[comp], [])
    if "pe_projector" in params:
        for k, v in params["pe_projector"].items():
            out[f"network_dict.pe_projector.{k}"] = np.asarray(v)
    if "cls_head" in params:
        for name, leaf in params["cls_head"].items():
            seq_idx = 2 * int(name[3:])
            out[f"network_dict.cls_head.{seq_idx}.weight"] = np.asarray(
                leaf["kernel"]
            ).T
            out[f"network_dict.cls_head.{seq_idx}.bias"] = np.asarray(
                leaf["bias"]
            )
    return out
