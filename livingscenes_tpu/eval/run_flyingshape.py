"""FlyingShape benchmark CLI (eval_flyingshape.py:216-230 equivalent).

    python -m livingscenes_tpu.eval.run_flyingshape --data <dataset_dir> \
        [--ckpt <torch_or_flax_checkpoint>] [--tasks matching,reloc,recon]
"""
from __future__ import annotations

import argparse
import json
import logging

import jax

from ..models.shape_prior import ShapePrior, ShapePriorConfig
from ..solver import MoreSolver, MoreSolverConfig
from ..train.logger import configure_logging
from .flyingshape import (
    FlyingShapeDataset,
    eval_matching,
    eval_reconstruction,
    eval_relocalization,
)

log = logging.getLogger(__name__)


def load_solver(
    ckpt: str | None, fast: bool = True, parity: bool = False
) -> MoreSolver:
    # fast: fused Pallas attention on TPU (100% matching agreement vs the
    # XLA path, docs/ROUND2_NOTES.md); no-op off-TPU.
    #
    # parity: pin every knob that deliberately deviates from the reference
    # back to reference behavior, so --parity metric rows measure port
    # fidelity rather than this framework's improvements. Today that is
    # the per-instance ICP acceptance (the reference applies ICP
    # unconditionally after the refinement, more_solver.py:181-184;
    # RegistrationConfig.icp_accept defaults to the improved "symch").
    model = ShapePrior(ShapePriorConfig(pallas_attention=fast))
    if ckpt and ckpt.endswith(".pt"):
        from ..models.convert import load_torch_checkpoint

        params = load_torch_checkpoint(ckpt)
    elif ckpt:
        from flax import serialization

        with open(ckpt, "rb") as f:
            # template-free restore: trainer checkpoints carry params +
            # optimizer state + step (train/trainer.py save_checkpoint)
            payload = serialization.msgpack_restore(f.read())
        params = payload["params"]
    else:
        log.warning("no checkpoint given — using random weights")
        params = model.init_params(jax.random.PRNGKey(0))
    cfg = MoreSolverConfig()
    if parity:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            registration=dataclasses.replace(
                cfg.registration, icp_accept="always"
            ),
        )
    return MoreSolver(model, params, cfg)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--tasks", default="matching,reloc")
    parser.add_argument("--optim", action="store_true",
                        help="SE(3) refinement during relocalization")
    parser.add_argument("--out", default=None, help="write results json")
    args = parser.parse_args(argv)

    configure_logging()
    dataset = FlyingShapeDataset(args.data)
    log.info("FlyingShape: %d scenes", len(dataset))
    solver = load_solver(args.ckpt)

    results = {}
    tasks = args.tasks.split(",")
    if "matching" in tasks:
        results["matching"] = eval_matching(dataset, solver)
    if "reloc" in tasks:
        results["relocalization"] = eval_relocalization(
            dataset, solver, optim=args.optim
        )
    if "recon" in tasks:
        results["reconstruction"] = eval_reconstruction(dataset, solver)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
