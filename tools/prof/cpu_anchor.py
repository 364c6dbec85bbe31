#!/usr/bin/env python
"""Same-host CPU anchor: time the ACTUAL torch reference against this
framework's JAX build on the identical CPU, same workload shape as bench.py
(1024px inversion, batch 1; reference protocol
run_ood_faceGAN_inversion.py:167-187).

The reference repo publishes no GPU numbers (BASELINE.md), so this measured
CPU-vs-CPU ratio is the traceable part of the baseline chain:
    torch-CPU  --(this script)-->  jax-CPU  --(bench.py)-->  jax-TPU
and the documented A100 estimate stays a separate, labeled extrapolation.

Usage: python tools/prof/cpu_anchor.py [--iters 3] [--full|--gen-only]
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


def time_fn(fn, iters, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    torch.set_num_threads(os.cpu_count())

    from ref_compat import load_reference_module, zero_noise_injection

    results = {}
    size = args.size

    # ---------------- generator-only (the decode hot loop) ----------------
    m = load_reference_module("src.ops.StyleGAN.model")
    torch.manual_seed(0)
    ref_gen = m.Generator(size=size, style_dim=512, n_mlp=8,
                          channel_multiplier=2).eval()
    n_lat = int(np.log2(size)) * 2 - 2
    lat = torch.randn(1, n_lat, 512)
    with torch.no_grad():
        t_ref = time_fn(lambda: ref_gen(lat, input_is_tensor=True,
                                        input_is_latent=True), args.iters)
    results["torch_cpu_generator_s"] = round(t_ref, 3)

    from ood_gan_inversion_tpu.nn import Generator
    gen = Generator(size=size, style_dim=512, n_mlp=8, channel_multiplier=2)
    lat_j = jnp.asarray(lat.numpy())
    variables = gen.init({"params": jax.random.PRNGKey(0),
                          "noise": jax.random.PRNGKey(1)}, lat_j)
    fwd = jax.jit(lambda p, l, k: gen.apply({"params": p}, l,
                                            rngs={"noise": k}))
    k = jax.random.PRNGKey(2)
    t_jax = time_fn(
        lambda: jax.block_until_ready(fwd(variables["params"], lat_j, k)),
        args.iters)
    results["jax_cpu_generator_s"] = round(t_jax, 3)
    results["generator_jax_over_torch"] = round(t_ref / t_jax, 3)

    if not args.gen_only:
        # ---------------- full inversion pipeline -------------------------
        a = load_reference_module("src.archs.OOD_faceGAN_e4e_arch")
        torch.manual_seed(0)
        ref = a.ood_faceGAN_e4e(
            out_size=size, style_dim=512, n_mlp=8, channel_multiplier=2,
            encoder="E4E", enable_modulation=True, modulation_type="NOISE",
            warp_scale=0.08, cycle_align=2, blend_with_gen=True,
            stage="Inference", ModSize=256).eval()
        x = torch.rand(1, 3, size, size) * 2 - 1
        with zero_noise_injection():   # avoid NaN from zero-init weights
            for mod in ref.modules():
                if isinstance(mod, m.NoiseInjection):
                    mod.weight.data.fill_(0.5)
            with torch.no_grad():
                t_ref_full = time_fn(lambda: ref(x), args.iters)
        results["torch_cpu_pipeline_s"] = round(t_ref_full, 3)

        from ood_gan_inversion_tpu.archs import build_network
        net = build_network({
            "type": "ood_faceGAN_e4e", "out_size": size, "style_dim": 512,
            "encoder": "E4E", "enable_modulation": True,
            "modulation_type": "NOISE", "warp_scale": 0.08, "cycle_align": 2,
            "blend_with_gen": True})
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        variables = net.init({"params": jax.random.PRNGKey(0),
                              "noise": jax.random.PRNGKey(1)}, xj,
                             mod_size=256)
        fwd_full = jax.jit(lambda p, xx, kk: net.apply(
            {"params": p}, xx, mod_size=256, rngs={"noise": kk}))
        t_jax_full = time_fn(
            lambda: jax.block_until_ready(
                fwd_full(variables["params"], xj, k)), args.iters)
        results["jax_cpu_pipeline_s"] = round(t_jax_full, 3)
        results["pipeline_jax_over_torch"] = round(t_ref_full / t_jax_full, 3)

    results["cpu_count"] = os.cpu_count()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
