"""Serving-path benchmark: request latency + throughput of the micro-batching
server under concurrent load on the real chip.

Usage (TPU): python tools/prof/prof_serve.py
Env: CONC=1,4,8 (concurrency sweep), N=32 (requests per level), SIZE=1024,
     SHARD=0 (data-shard over this many devices).

Reports per concurrency level: p50/p95 request latency, aggregate imgs/s,
batching counters. Warmup pre-compiles all batch shapes so the sweep never
times a compile.
"""

import asyncio
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from ood_gan_inversion_tpu.infer import InversionEngine  # noqa: E402
from ood_gan_inversion_tpu.serve import BatchingServer  # noqa: E402


def main():
    size = int(os.environ.get("SIZE", "1024"))
    n_req = int(os.environ.get("N", "32"))
    conc_levels = [int(c) for c in os.environ.get("CONC", "1,4,8").split(",")]
    shard = int(os.environ.get("SHARD", "0"))

    opt = {"network_g": {
        "type": "ood_faceGAN_e4e", "out_size": size, "style_dim": 512,
        "channel_multiplier": 2, "enable_modulation": True,
        "modulation_type": "NOISE", "warp_scale": 0.08, "cycle_align": 3,
        "blend_with_gen": True, "ModSize": 256,
    }}
    engine = InversionEngine(opt)
    mesh = None
    if shard > 1:
        import jax
        from ood_gan_inversion_tpu.parallel import make_mesh
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        mesh = make_mesh((accel or jax.devices())[:shard])
    srv = BatchingServer(engine, max_batch=max(conc_levels),
                         max_wait_ms=3.0, mesh=mesh)
    t0 = time.time()
    sizes = srv.warmup()
    print(f"warmup {sizes} in {time.time() - t0:.1f}s", flush=True)

    img = np.random.RandomState(0).rand(size, size, 3).astype(np.float32)

    async def one(sem, lats):
        async with sem:
            t = time.monotonic()
            await srv.invert(img)
            lats.append(time.monotonic() - t)

    async def level(conc):
        await srv.start()
        lats = []
        sem = asyncio.Semaphore(conc)
        t = time.monotonic()
        await asyncio.gather(*[one(sem, lats) for _ in range(n_req)])
        wall = time.monotonic() - t
        await srv.stop()
        lats = np.array(sorted(lats))
        return {
            "conc": conc,
            "p50_ms": float(lats[len(lats) // 2] * 1000),
            "p95_ms": float(lats[int(len(lats) * 0.95)] * 1000),
            "imgs_per_sec": n_req / wall,
        }

    for conc in conc_levels:
        r = asyncio.run(level(conc))
        print(f"conc={r['conc']}: p50 {r['p50_ms']:.1f} ms, "
              f"p95 {r['p95_ms']:.1f} ms, {r['imgs_per_sec']:.2f} imgs/s "
              f"(stats {srv.stats})", flush=True)


if __name__ == "__main__":
    main()
