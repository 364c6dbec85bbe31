"""Conv achieved-rate vs spatial shape at the body0 hot shapes.

The r4 batchfold experiment (PERF.md) showed the b=1 conv advantage is
SHAPE-driven: folding b=2 into H (H=512) ran WORSE than the batched b=2
program. This probes the inverse: does splitting the b=1 H=256 conv into
independent shorter-H subgraphs (exact math via halo slices of the padded
input, split1-style) beat XLA's schedule for the tall conv? Measures the
bare conv3x3 and the body0 conv1+PReLU+conv2 tail at 256px (2C=256) and
128px (2C=512) shapes, whole vs split2/split4, plus H=512 to reproduce the
taller-is-worse datapoint. Slope protocol (utils/timing.py) on a scan
chain; chained carry keeps every iteration live.
"""
import os, sys
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from ood_gan_inversion_tpu.utils.timing import device_ms_per_call

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
print("device:", tpu, file=sys.stderr)
N_CHAIN = 10
DT = jnp.bfloat16


def conv_same(v, k):
    return lax.conv_general_dilated(
        v, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_valid_h(v, k):
    # v already carries the +1 halo rows and SAME-padded W
    return lax.conv_general_dilated(
        v, k, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_split(k1, al, k2, n_pieces, tail):
    """conv1(+PReLU+conv2) computed as n_pieces independent H-slices."""
    def f(x):
        b, h, w, c = x.shape
        hh = h // n_pieces
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        outs = []
        for i in range(n_pieces):
            piece = lax.slice_in_dim(xp, i * hh, i * hh + hh + 2, axis=1)
            y = conv_valid_h(piece, k1)
            if tail:
                y = jnp.where(y >= 0, y, al * y)
                yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
                y = conv_valid_h(yp, k2)
            outs.append(y)
        return jnp.concatenate(outs, axis=1)
    return f


def make_whole(k1, al, k2, tail):
    def f(x):
        y = conv_same(x, k1)
        if tail:
            y = jnp.where(y >= 0, y, al * y)
            y = conv_same(y, k2)
        return y
    return f


def bench(label, fn, x):
    def body(carry, _):
        out = fn(carry)
        return carry + (jnp.mean(out) * 1e-12).astype(carry.dtype), ()

    @jax.jit
    def run(x):
        y, _ = lax.scan(body, x, None, length=N_CHAIN)
        return jnp.sum(y.astype(jnp.float32))

    ms, _ = device_ms_per_call(run, [(x,)], windows=3, pair=(2, 8))
    per_op = ms / N_CHAIN
    px = x.shape[0] * x.shape[1] * x.shape[2]
    print(f"{label:42s} {per_op:8.3f} ms/op  {per_op / px * 1e6:7.3f} us/kpx",
          file=sys.stderr, flush=True)
    return per_op


rs = np.random.RandomState(0)
SEL = os.environ.get("SEL", "256,128,512")
for h, w, c2 in ((256, 256, 256), (128, 128, 512), (512, 256, 256)):
    if str(h) not in SEL.split(","):
        continue
    k1 = jnp.asarray(rs.randn(3, 3, c2, c2) * 0.05, DT)
    k2 = jnp.asarray(rs.randn(3, 3, c2, c2) * 0.05, DT)
    al = jnp.asarray(rs.rand(1, 1, 1, c2) * 0.3, DT)
    x = jax.device_put(jnp.asarray(rs.randn(1, h, w, c2) * 0.5, DT), tpu)
    for tail in (False, True):
        tag = "c1+prelu+c2" if tail else "conv3x3"
        bench(f"{tag} {h}x{w} C={c2} whole", make_whole(k1, al, k2, tail), x)
        for npc in (2, 4):
            if h // npc >= 16:
                bench(f"{tag} {h}x{w} C={c2} split{npc}",
                      make_split(k1, al, k2, npc, tail), x)
