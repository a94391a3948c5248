#!/usr/bin/env python3
"""Export a native ``.npz`` checkpoint as a reference-compatible ``.pth``.

The reverse of the built-in ``.pth`` converter: the output drops into the
PyTorch reference's eval and its GPU-side resume unchanged
(``module.``-prefixed ``net`` state dict — the reference wraps in
DataParallel unconditionally in eval, ``test.py:158-159``, and whenever
CUDA is available in train, ``train.py:190-203`` — plus the
``optimizer/epoch/lr_schedule/loss`` fields its resume reads,
``train.py:160-163,288-294``). For a CPU-only reference ``train.py``
resume (bare, unwrapped net) pass ``--no_module_prefix``. Architecture
flags must match the checkpoint, exactly as the reference CLIs
re-declare them.

    python tools/export_pth.py ck.npz out.pth --descriptor FPFH --l 9
"""

import argparse
import os
import sys


def main(argv=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mdgat_tpu.cli import _parse_k
    from mdgat_tpu.core.checkpoint import load_checkpoint, save_pth_checkpoint
    from mdgat_tpu.core.config import test_defaults

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("npz", help="native .npz checkpoint (core/checkpoint.py)")
    ap.add_argument("pth", help="output .pth path")
    ap.add_argument("--net", default="mdgat", choices=["mdgat", "superglue"])
    ap.add_argument("--descriptor", default="FPFH",
                    choices=["FPFH", "FPFH_gloabal", "FPFH_only",
                             "pointnet", "pointnetmsg"])
    ap.add_argument("--k", type=_parse_k,
                    default=[128, None, 128, None, 64, None, 64, None])
    ap.add_argument("--l", type=int, default=9)
    ap.add_argument("--no_module_prefix", action="store_true",
                    help="omit the DataParallel 'module.' key prefix "
                         "(needed only for a CPU-only reference train.py "
                         "resume, where the net is never wrapped)")
    args = ap.parse_args(argv)

    cfg = test_defaults().replace(net=args.net, descriptor=args.descriptor,
                                  k=None if args.net == "superglue"
                                  else args.k, L=args.l)
    ck = load_checkpoint(args.npz)
    meta = ck.get("meta", {})
    save_pth_checkpoint(
        args.pth, ck["params"], ck["bn_state"], cfg,
        epoch=int(meta.get("epoch", 0)),
        lr=float(meta.get("lr_schedule", 0.0)),
        loss=float(meta.get("loss", 0.0)),
        module_prefix=not args.no_module_prefix)
    print(f"exported {args.npz} -> {args.pth} "
          f"(net={args.net}, descriptor={args.descriptor}, L={args.l})")


if __name__ == "__main__":
    main()
