"""3RScan benchmark CLI (eval_3rscan.py:504-518 equivalent).

    python -m livingscenes_tpu.eval.run_3rscan --data <3RScan/data dir> \
        [--ckpt ...] [--tasks matching,reloc,recon] [--mask-name pred.npz]

Parity runbook (VERDICT r3 ask #8 — the day the released torch weights
and the real dataset are available, reproducing the reference's table,
README.md:100-111, is ONE command):

    python -m livingscenes_tpu.eval.run_3rscan \
        --parity /path/to/LivingScenes_latest.pt --data <3RScan root>

which (1) converts the torch checkpoint (models/convert.py) and verifies
the conversion round-trips bit-exactly, (2) runs all three eval loops —
matching, relocalization with AND without the 400-step refinement,
reconstruction — and (3) prints the metric table in the reference's own
format (eval_3rscan.py:329-332/446-458) for side-by-side comparison
with the paper. Smoke-tested on synthetic fixtures in
tests/test_eval_drivers.py::test_parity_runbook_smoke.
"""
from __future__ import annotations

import argparse
import json
import logging

from ..train.logger import configure_logging
from .rescan3r import (
    Dataset3RScan,
    eval_matching,
    eval_reconstruction,
    eval_relocalization,
)
from .run_flyingshape import load_solver

log = logging.getLogger(__name__)


def verify_conversion(ckpt_path: str) -> int:
    """Convert the torch checkpoint and check the mapping round-trips.

    Returns the number of converted tensors. A torch state dict produced
    back from the converted params must match the source exactly — this
    catches key-mapping drift before any metric is computed."""
    import numpy as np
    import torch

    from ..models.convert import (
        load_torch_checkpoint,
        params_to_torch_state_dict,
    )

    params = load_torch_checkpoint(ckpt_path)
    back = params_to_torch_state_dict(params)
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("model_state_dict", raw)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    # Bit-exact and key-complete in BOTH directions: a tensor the
    # converter silently drops (present in sd, never re-exported) is a
    # conversion bug, not a pass. Buffers that carry no weights
    # (num_batches_tracked counters) are the only tolerated difference.
    dropped = sorted(
        k for k in sd
        if k not in back and not k.endswith("num_batches_tracked")
    )
    extra = sorted(k for k in back if k not in sd)
    if dropped or extra:
        raise RuntimeError(
            "conversion round-trip key mismatch: "
            f"dropped from re-export {dropped[:8]}{'…' if len(dropped) > 8 else ''}, "
            f"not in source {extra[:8]}{'…' if len(extra) > 8 else ''}"
        )
    n_checked = 0
    for key, val in back.items():
        src = np.asarray(sd[key].detach().cpu().numpy(), np.float32)
        got = np.asarray(val, np.float32)
        if src.shape != got.shape or not np.array_equal(src, got):
            raise RuntimeError(
                f"conversion round-trip mismatch at {key}: "
                f"{src.shape} vs {got.shape}"
            )
        n_checked += 1
    if n_checked == 0:
        raise RuntimeError("conversion round-trip checked 0 tensors")
    log.info("checkpoint conversion verified: %d tensors round-trip"
             " bit-exactly", n_checked)
    return n_checked


def parity_table(results: dict) -> str:
    """The reference's metric table (eval_3rscan.py:329-332, 446-458),
    one line per published row, formatted for side-by-side comparison."""
    fmt = lambda v: "-" if v is None else f"{v:.2f}"
    m = results.get("matching", {})
    lines = [
        "=== 3RScan parity table (reference format) ===",
        "Object-level matching recall: (all) {} | (static) {} |"
        " (dynamic) {}".format(
            fmt(m.get("object_recall")),
            fmt(m.get("static_recall")),
            fmt(m.get("dynamic_recall")),
        ),
        "Scene-level Hits Recall: @75 {} | K@50 {} | K@25 {}".format(
            fmt(m.get("scene_recall@75")),
            fmt(m.get("scene_recall@50")),
            fmt(m.get("scene_recall@25")),
        ),
    ]
    for tag, key in (
        ("reloc (Kabsch+ICP)", "relocalization"),
        ("reloc (+400-step optim)", "relocalization_optim"),
        ("reloc [NON-PARITY: symch ICP accept]", "relocalization_symch"),
        ("reloc+optim [NON-PARITY: symch ICP accept]",
         "relocalization_optim_symch"),
    ):
        r = results.get(key)
        if not r:
            continue
        lines.append(
            "{}: recall(RMSE<0.1) {} | median RRE {} | median RTE {} |"
            " recall(RRE<10) {} | median chamfer {}".format(
                tag,
                fmt(r.get("recall_T0.1")),
                fmt(r.get("median_rre")),
                fmt(r.get("median_rte")),
                fmt(r.get("recall_rre10")),
                "-" if r.get("median_chamfer") is None
                else f"{r['median_chamfer']:.4f}",
            )
        )
    rc = results.get("reconstruction")
    if rc:
        lines.append(
            "Reconstruction: chamfer(1-way) {} | SDF recall {}".format(
                "-" if rc.get("chamfer_1way_mean") is None
                else f"{rc['chamfer_1way_mean']:.5f}",
                fmt(rc.get("sdf_recall")),
            )
        )
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--split", default="val")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--tasks", default="matching,reloc")
    parser.add_argument(
        "--parity", metavar="TORCH_CKPT", default=None,
        help="parity runbook: convert + verify this torch checkpoint,"
        " run ALL eval loops (reloc both with and without the 400-step"
        " refinement), print the reference's metric table",
    )
    parser.add_argument(
        "--mask-name", default=None,
        help="predicted-instance mask npz (Mask3D); GT masks if omitted",
    )
    parser.add_argument("--recon-gt", default=None)
    parser.add_argument("--no-optim", action="store_true")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    configure_logging()
    dataset = Dataset3RScan(
        args.data,
        split=args.split,
        use_gt_mask=args.mask_name is None,
        mask_name=args.mask_name,
    )
    log.info("3RScan: %d scenes", len(dataset))

    if args.parity:
        if args.parity.endswith(".pt"):
            verify_conversion(args.parity)
        # Reference-faithful knobs (icp_accept="always" — the reference's
        # unconditional ICP polish, more_solver.py:181-184) so the parity
        # rows measure port fidelity, not this framework's improved
        # per-instance acceptance. The improved default is reported as
        # separate labeled rows below.
        solver = load_solver(args.parity, parity=True)
        solver_improved = load_solver(args.parity)
        tasks = ["matching", "reloc", "recon"]
    else:
        solver = load_solver(args.ckpt)
        tasks = args.tasks.split(",")

    results = {}
    if "matching" in tasks:
        results["matching"] = eval_matching(dataset, solver)
    if "reloc" in tasks:
        if args.parity:
            results["relocalization"] = eval_relocalization(
                dataset, solver, optim=False
            )
            results["relocalization_optim"] = eval_relocalization(
                dataset, solver, optim=True
            )
            # Same loops under the production icp_accept="symch" default —
            # labeled separately so the improvement never contaminates the
            # side-by-side parity claim.
            results["relocalization_symch"] = eval_relocalization(
                dataset, solver_improved, optim=False
            )
            results["relocalization_optim_symch"] = eval_relocalization(
                dataset, solver_improved, optim=True
            )
        else:
            results["relocalization"] = eval_relocalization(
                dataset, solver, optim=not args.no_optim
            )
    if "recon" in tasks:
        results["reconstruction"] = eval_reconstruction(
            dataset, solver, recon_gt_dir=args.recon_gt
        )
    print(json.dumps(results, indent=2))
    if args.parity:
        print(parity_table(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
