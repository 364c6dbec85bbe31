#!/usr/bin/env python
"""Same-host CPU TRAIN-STEP anchor: time the ACTUAL torch reference training
step (src/models/OOD_faceGAN_model.py:optimize_parameters — D update + G
update with GAN/pixel/mask losses) against this framework's fused train_step
on the identical CPU and identical shapes/losses.

Complements tools/prof/cpu_anchor.py (inference anchor): together they give
a measured torch-vs-jax ratio on equal hardware for both serving and
training, since the reference publishes no GPU numbers (BASELINE.md).

Workload: 256px OOD e4e arch (cycle_align 2, NOISE modulation), batch 2,
skip_latent_g (the shipped E4E_Face.yml setting), gan+pix+mask losses
(perceptual is excluded on BOTH sides: the reference's VGG19 needs a
torchvision download that this offline image cannot do). Plain-phase iters
(odd steps — no r1/path), zero-noise deterministic.

Usage: python tools/prof/cpu_anchor_train.py [--iters 2] [--size 256]
Writes one JSON line to stdout.
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "tests"))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--no-remat", action="store_true",
                    help="disable jax.checkpoint in the G step (the remat "
                         "trades CPU-flops for TPU-HBM; off is the fair CPU "
                         "configuration)")
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    import test_reference_parity_trainstep as tp
    from ref_compat import zero_noise_injection
    from test_reference_parity import zero_noise_lists

    size, b, k = args.size, args.batch, 1
    tp.SIZE = size
    tp.B = b

    x = (np.random.RandomState(0).rand(b, k, size, size, 3)
         .astype(np.float32) * 2 - 1)

    # ---------------------------------------------------------- torch side
    mod = tp._load_reference_model_module()
    torch.manual_seed(0)
    opt = tp._ref_opt()
    opt["network_g"]["out_size"] = size
    opt["network_g"]["ModSize"] = size if size <= 256 else 256
    opt["network_d"]["out_size"] = size
    ref_model = mod.ood_faceGAN_Model(opt)
    g = ref_model.get_bare_model(ref_model.net_g)
    g.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    ref_model.net_g_ema.delta_latent = torch.nn.Parameter(
        torch.zeros(1, g.style_cnt, 512), requires_grad=False)
    t5 = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)))
    ref_model.feed_data({"gt": t5, "lr": t5.clone(),
                         "lq_size": torch.ones(b, k),
                         "deg_type": torch.zeros(b, k)})

    ref_step = None
    if not args.skip_torch:
        with zero_noise_injection():
            ref_model.optimize_parameters(1)        # warmup (allocs, caches)
            t0 = time.perf_counter()
            for i in range(args.iters):
                ref_model.optimize_parameters(3 + 2 * i)  # odd: plain phase
            ref_step = (time.perf_counter() - t0) / args.iters
        print(f"torch reference: {ref_step:.2f} s/step", file=sys.stderr)

    # ------------------------------------------------------------ jax side
    from ood_gan_inversion_tpu.models import build_model
    opt_j = tp._our_opt()
    opt_j["network_g"]["out_size"] = size
    opt_j["network_g"]["progressiveModSize"] = [min(size, 256)]
    opt_j["network_d"]["out_size"] = size
    if args.no_remat:
        opt_j["train"]["remat"] = False
    model_j = build_model(opt_j)
    state = model_j.init_state(jax.random.PRNGKey(0), (b * k, size, size, 3))
    _, jl = zero_noise_lists(size, batch=b * k)
    model_j._forward = lambda pg, xx, rng, mod_size, stage: \
        model_j.net_g.apply({"params": pg}, xx, mod_size=mod_size,
                            stage=stage, noise=jl)
    batch_j = {"gt": jnp.asarray(x), "lr": jnp.asarray(x),
               "lq_size": jnp.ones((b, k)), "deg_type": jnp.zeros((b, k))}

    t0 = time.perf_counter()
    state, _ = model_j.train_step(state, batch_j, jax.random.PRNGKey(1), 1)
    jax.block_until_ready(state.params_g_train)
    print(f"jax compile+first step: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)
    state, _ = model_j.train_step(state, batch_j, jax.random.PRNGKey(2), 3)
    jax.block_until_ready(state.params_g_train)
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, _ = model_j.train_step(state, batch_j,
                                      jax.random.PRNGKey(4 + i), 5 + 2 * i)
    jax.block_until_ready(state.params_g_train)
    jax_step = (time.perf_counter() - t0) / args.iters
    print(f"jax: {jax_step:.2f} s/step", file=sys.stderr)

    out = {"metric": f"cpu_train_step_anchor_{size}px_b{b}",
           "jax_s_per_step": round(jax_step, 3),
           "remat": not args.no_remat}
    if ref_step is not None:
        out["torch_ref_s_per_step"] = round(ref_step, 3)
        out["jax_over_torch_speedup"] = round(ref_step / jax_step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
