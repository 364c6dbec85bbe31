"""Serving-path hardware benchmark (VERDICT r2 item 6 / PERF.md round 3).

Runs the BatchingServer on the real chip at the 1024px serving config and
drives it with closed-loop concurrent clients (each sends its next request
when its previous reply lands — the standard serving load model), reporting
per-request p50/p99 latency and aggregate throughput at 1/4/8 clients.

The reference ships offline CLIs only (run_ood_faceGAN_inversion.py) — no
serving row exists to compare against; these are our numbers to beat.

Env: CLIENTS (default "1,4,8"), REQS per client (default 24),
MAX_WAIT_MS (default 5).

LOOPBACK=1 (r5 VERDICT ask #7): replies carry a 1x1 probe instead of the
full image (BatchingServer fetch="probe") AND the request image is
pre-staged on device (staged_input — dispatches build batches by
device-side concat), so neither direction crosses the ~12 MB/s relay
tunnel and the collector/batch/split logic is exercised at DEVICE rates.
(First loopback cut kept real request uploads: every row saturated at
1.3-2.1 req/s because a 1024px fp32 request body is ~1 s of tunnel —
PERF.md r5.) Rows run split_below 7 vs 0 and max_inflight 1 vs 2 (the
pipelined collector hides the ~29 ms per-dispatch fetch RTT).
"""
import asyncio
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax

from ood_gan_inversion_tpu.infer import InversionEngine
from ood_gan_inversion_tpu.serve import BatchingServer

OPT = {"network_g": {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "ModSize": 256, "dtype": "bfloat16",
}}

REQS = int(os.environ.get("REQS", "24"))
WAIT = float(os.environ.get("MAX_WAIT_MS", "5"))


async def drive(srv, n_clients, img):
    lats = []

    async def client(i):
        for r in range(REQS):
            t0 = time.perf_counter()
            await srv.invert(img)
            lats.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    await asyncio.gather(*[client(i) for i in range(n_clients)])
    wall = time.perf_counter() - t0
    return np.array(lats), wall


def main():
    print("device:", [d for d in jax.devices() if d.platform != "cpu"][0],
          file=sys.stderr)
    loopback = os.environ.get("LOOPBACK") == "1"
    engine = InversionEngine(OPT)
    fetch = "probe" if loopback else "full"
    variants = ([("split7_if1", 7, 1), ("split7_if2", 7, 2),
                 ("split0_if1", 0, 1), ("split0_if2", 0, 2)] if loopback
                else [("", 0, 1)])
    img = (np.random.RandomState(0).rand(1024, 1024, 3) * 0.9).astype(
        np.float32)

    for tag, sb, inflight in variants:
        srv = BatchingServer(engine, max_batch=8, max_wait_ms=WAIT,
                             split_below=sb, fetch=fetch,
                             staged_input=img if loopback else None,
                             max_inflight=inflight)
        t0 = time.time()
        sizes = srv.warmup()
        print(f"{tag} warmup: compiled batch sizes {sizes} in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)

        async def run_all():
            await srv.start()
            default_clients = "1,4,8,16" if loopback else "1,4,8"
            for n in [int(v) for v in
                      os.environ.get("CLIENTS", default_clients).split(",")]:
                lats, wall = await drive(srv, n, img)  # warms pacing
                lats, wall = await drive(srv, n, img)
                thr = len(lats) / wall
                print(f"{tag:7s} clients={n:2d}"
                      f"  p50 {np.percentile(lats, 50) * 1000:7.1f} ms"
                      f"  p99 {np.percentile(lats, 99) * 1000:7.1f} ms"
                      f"  throughput {thr:5.1f} req/s"
                      f"  ({len(lats)} reqs in {wall:.1f}s)",
                      file=sys.stderr, flush=True)
            await srv.stop()
            print(f"{tag} server stats:", srv.stats, file=sys.stderr)

        asyncio.run(run_all())


if __name__ == "__main__":
    main()
