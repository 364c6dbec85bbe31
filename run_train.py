#!/usr/bin/env python
"""Train CLI (reference run_train.py): python run_train.py --opt <yml>"""

import os as _os
if _os.environ.get("JAX_PLATFORMS") == "axon":
    # keep the TPU default but make the CPU backend available for fast
    # host-side param init (see models/ood_model.py init_state)
    _os.environ["JAX_PLATFORMS"] = "axon,cpu"

import os.path as osp

from ood_gan_inversion_tpu.train import train_pipeline

if __name__ == "__main__":
    root_path = osp.abspath(osp.dirname(__file__))
    train_pipeline(root_path)
