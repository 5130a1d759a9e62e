"""3RScan benchmark CLI (eval_3rscan.py:504-518 equivalent).

    python -m livingscenes_tpu.eval.run_3rscan --data <3RScan/data dir> \
        [--ckpt ...] [--tasks matching,reloc,recon] [--mask-name pred.npz]
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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--split", default="val")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--tasks", default="matching,reloc")
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
    solver = load_solver(args.ckpt)

    results = {}
    tasks = args.tasks.split(",")
    if "matching" in tasks:
        results["matching"] = eval_matching(dataset, solver)
    if "reloc" in tasks:
        results["relocalization"] = eval_relocalization(
            dataset, solver, optim=not args.no_optim
        )
    if "recon" in tasks:
        results["reconstruction"] = eval_reconstruction(
            dataset, solver, recon_gt_dir=args.recon_gt
        )
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
