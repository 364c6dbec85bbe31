#!/usr/bin/env python
"""Single-image / folder inversion CLI
(reference run_ood_faceGAN_inversion.py:126-191).

python run_inversion.py --opt options/test/E4E_Face_test.yml \
    [--ckpt <orbax-or-npz>] [--out results/inversion] \
    [--direction smile --intensity 1.5]
"""

import os as _os
if _os.environ.get("JAX_PLATFORMS") == "axon":
    # keep the TPU default but make the CPU backend available for fast
    # host-side param init (see models/ood_model.py init_state)
    _os.environ["JAX_PLATFORMS"] = "axon,cpu"

import argparse
import os.path as osp

import yaml

from ood_gan_inversion_tpu.infer import run_inversion
from ood_gan_inversion_tpu.utils import checkpoint as ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax dir or converter .npz")
    ap.add_argument("--out", default=None)
    ap.add_argument("--direction", default=None)
    ap.add_argument("--dir_path", default="directions")
    ap.add_argument("--intensity", type=float, default=1.0)
    args = ap.parse_args()

    with open(args.opt) as f:
        opt = yaml.safe_load(f)
    if args.direction:
        opt["editing"] = {"direction": args.direction,
                          "dir_path": args.dir_path,
                          "intensity": args.intensity}
    out_dir = args.out or osp.join("results", opt.get("name", "inversion"))

    params = None
    if args.ckpt:
        import numpy as np
        from flax import traverse_util
        if args.ckpt.endswith(".npz"):
            flat = dict(np.load(args.ckpt))
            params = traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
        else:
            tree = ckpt.load_pytree(args.ckpt)
            params = tree.get("params", tree)

    report = run_inversion(opt, out_dir, params=params)
    print(report)


if __name__ == "__main__":
    main()
