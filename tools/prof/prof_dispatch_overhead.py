"""Attribute the serving dispatch overhead seen in the r5 staged loopback
table (p50 ~136-186 ms per b=1 dispatch vs ~51 ms expected = 22 ms compute
+ ~29 ms fetch RTT). Times each piece of BatchingServer._run_batch's staged
path in isolation on the real chip: device-side concat, keys upload, the
jitted forward, probe slice fetches (image, then mask), and the combined
path, wall-clock per call over N sequential calls (closed-loop — this is a
latency attribution, not a slope measurement).
"""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

from ood_gan_inversion_tpu.infer import InversionEngine

OPT = {"network_g": {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "ModSize": 256, "dtype": "bfloat16",
}}
N = 12

eng = InversionEngine(OPT)
dev = eng.device
print("device:", dev, file=sys.stderr)
img = (np.random.RandomState(0).rand(1024, 1024, 3) * 0.9).astype(np.float32)
from ood_gan_inversion_tpu.utils.img_util import img2input
staged = jax.device_put(jnp.asarray(img2input(img, 1024)), dev)
keys_np = np.stack([np.asarray(jax.random.PRNGKey(0))], 0)
keys_dev = jax.device_put(jnp.asarray(keys_np), dev)


def timed(label, fn, n=N):
    fn()                                   # warm (compiles done here)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:46s} {dt:8.1f} ms/call", file=sys.stderr, flush=True)
    return dt


# piece 1: eager device-side concat (enqueue only, no fetch)
timed("concat [staged]*1 (enqueue)", lambda: jnp.concatenate([staged], 0))
timed("concat [staged]*8 (enqueue)", lambda: jnp.concatenate([staged] * 8, 0))

# piece 2: keys upload (np -> device, happens inside _dispatch_perkey)
timed("jnp.asarray(keys) upload", lambda: jnp.asarray(keys_np))

# piece 3: full dispatch, pre-staged x + device keys, probe fetch of image
out_holder = {}


def run_fwd():
    out = eng._dispatch_perkey(staged, keys_dev)
    out_holder["out"] = out
    return out


def fetch_probe_img(out):
    return np.asarray(out["image"][:, :1, :1, :])


def fetch_probe_mask(out):
    return np.asarray(out["mask"][:, :1, :1])


timed("dispatch only (block_until_ready noop)", run_fwd)

# raw jit call, no block_until_ready: isolates the enqueue itself
fwd = eng._fwd_perkey[None]
timed("raw jit call (no block_until_ready)",
      lambda: fwd(eng.params, staged, keys_dev))
timed("block_until_ready alone (same out)",
      lambda: jax.block_until_ready(out_holder["out"]["image"]))
timed("raw jit + image probe fetch",
      lambda: fetch_probe_img(fwd(eng.params, staged, keys_dev)))

# outputs-subset program: only image+mask leaves (the serving contract)
timed("dispatch only, outputs=(image,mask)",
      lambda: eng._dispatch_perkey(staged, keys_dev, ("image", "mask")))
timed("subset dispatch + image probe fetch",
      lambda: fetch_probe_img(
          eng._dispatch_perkey(staged, keys_dev, ("image", "mask"))))
timed("dispatch + image probe fetch",
      lambda: fetch_probe_img(run_fwd()))
timed("dispatch + image + mask probe fetches",
      lambda: (lambda o: (fetch_probe_img(o), fetch_probe_mask(o)))(
          run_fwd()))
timed("dispatch + np keys + concat + 2 fetches",
      lambda: (lambda o: (fetch_probe_img(o), fetch_probe_mask(o)))(
          eng._dispatch_perkey(jnp.concatenate([staged], 0),
                               jnp.asarray(keys_np))))
