#!/usr/bin/env python
"""Micro-batching inference server CLI (ood_gan_inversion_tpu/serve.py).

python run_serve.py --opt options/test/E4E_Face_test.yml \
    [--ckpt <orbax-or-npz>] [--port 8471] [--max-batch 8] [--max-wait-ms 5]

POST /invert with a raw float32 (H, W, 3) [0,1] body and an `x-shape`
header; GET /stats for the batching counters. Concurrent requests coalesce
into single TPU dispatches (pow2-padded batch shapes).
"""

import os as _os
if _os.environ.get("JAX_PLATFORMS") == "axon":
    _os.environ["JAX_PLATFORMS"] = "axon,cpu"

import argparse
import asyncio

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax dir or converter .npz")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8471)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--split-below", type=int, default=7,
                    help="dispatch coalesced groups smaller than this as "
                         "batch-1 calls (mitigates the v5e intermediate-"
                         "batch collapse, PERF.md r4; default 7 = measured "
                         "break-even there; 0 disables)")
    ap.add_argument("--max-inflight", type=int, default=2,
                    help="coalesced batches allowed in flight at once; 2 "
                         "overlaps one batch's reply fetch with the next "
                         "batch's compute (+15%% at >max-batch concurrent "
                         "clients, PERF.md r5 loopback; 1 = lockstep)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile every dispatchable batch shape before "
                         "accepting traffic (no compile stall on first hits)")
    ap.add_argument("--shard-devices", type=int, default=0,
                    help="data-shard each coalesced batch over this many "
                         "accelerator devices (0 = single-device dispatch)")
    args = ap.parse_args()

    with open(args.opt) as f:
        opt = yaml.safe_load(f)

    params = None
    if args.ckpt:
        import numpy as np
        from flax import traverse_util
        from ood_gan_inversion_tpu.utils import checkpoint as ckpt
        if args.ckpt.endswith(".npz"):
            flat = dict(np.load(args.ckpt))
            params = traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()})
        else:
            tree = ckpt.load_pytree(args.ckpt)
            params = tree.get("params", tree)

    from ood_gan_inversion_tpu.infer import InversionEngine
    from ood_gan_inversion_tpu.serve import BatchingServer

    engine = InversionEngine(opt, params=params)
    mesh = None
    if args.shard_devices > 1:
        import jax
        from ood_gan_inversion_tpu.parallel import make_mesh
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        mesh = make_mesh((accel or jax.devices())[:args.shard_devices])
    srv = BatchingServer(engine, max_batch=args.max_batch,
                         max_wait_ms=args.max_wait_ms, mesh=mesh,
                         split_below=args.split_below,
                         max_inflight=args.max_inflight)
    if args.warmup:
        sizes = srv.warmup()
        print(f"warmed batch shapes: {sizes}")
    print(f"serving on {args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms, "
          f"shard={args.shard_devices or 1})")
    asyncio.run(srv.serve_http(args.host, args.port))


if __name__ == "__main__":
    main()
