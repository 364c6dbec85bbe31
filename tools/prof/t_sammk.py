import sys; sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import os, time
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np, jax, jax.numpy as jnp
from ood_gan_inversion_tpu.ops.pallas_kernels import conv3x3_act, conv3x3_act_reference
tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
rs = np.random.RandomState(0)
for h, c in ((256, 256), (64, 1024)):
    x = jax.device_put(jnp.asarray(rs.randn(1, h, h, c).astype(np.float32)), tpu)
    k = jax.device_put(jnp.asarray((rs.randn(3, 3, c, c) * 0.02).astype(np.float32)), tpu)
    a = jax.device_put(jnp.asarray(rs.rand(c).astype(np.float32) * 0.3), tpu)
    t0 = time.time()
    out = jax.jit(lambda *v: conv3x3_act(*v, "prelu"))(x, k, a)
    jax.block_until_ready(out)
    print(f"{h}px c{c}: compile+run {time.time()-t0:.1f}s", flush=True)
    ref = conv3x3_act_reference(x, k, a, "prelu")
    print("  maxdiff:", float(jnp.max(jnp.abs(out - ref))), flush=True)
print("OK", flush=True)
