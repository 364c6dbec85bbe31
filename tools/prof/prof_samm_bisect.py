"""In-pipeline SAMM decomposition by graph surgery: time the FULL 1024px
inversion pipeline with individual SAMM sub-computations stubbed out, at
batch 1 and 4 (the batch-collapse workload). Per-op timings on this box are
untrustworthy (PERF.md); only whole-pipeline deltas are comparable."""
import os, sys, time
sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import numpy as np
import jax, jax.numpy as jnp

import ood_gan_inversion_tpu.nn.samm as samm
from ood_gan_inversion_tpu.archs import build_network

tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
cpu = jax.devices("cpu")[0]
print("device:", tpu, file=sys.stderr)

DTYPE = os.environ.get("DT", "bfloat16")
BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,4").split(",")]
VARIANTS = os.environ.get(
    "VARIANTS", "full,cycle1,nobody0,nobody1,noblur,nowarp,nomerge").split(",")

OPT = {
    "type": "ood_faceGAN_e4e", "out_size": 1024, "style_dim": 512,
    "encoder": "E4E", "enable_modulation": True, "modulation_type": "NOISE",
    "warp_scale": 0.08, "cycle_align": 2, "blend_with_gen": True,
    "dtype": DTYPE,
}

_orig_btn_call = samm._XavierBottleneckIR.__call__
_orig_body1 = None
_orig_blur = samm.fir_blur
_orig_warp = samm.grid_sample_bilinear
_orig_wbp = samm.warp_blend_platform
_orig_upadd = samm.SPMWarp._upsample_add


from ood_gan_inversion_tpu.nn import layers as _layers
_orig_in_call = _layers.InstanceNorm2d.__call__


restore_extra = []
_orig_alg_body0 = samm.algebraic_alignnet_body0
_orig_tctx_fn = samm.alignnet_t_context


def restore():
    samm._XavierBottleneckIR.__call__ = _orig_btn_call
    samm.fir_blur = _orig_blur
    samm.grid_sample_bilinear = _orig_warp
    samm.warp_blend_platform = _orig_wbp
    samm.SPMWarp._upsample_add = _orig_upadd
    samm.AlignNet.__call__ = _orig_alignnet_call
    samm.SPMWarp.__call__ = _orig_spm_call
    samm.algebraic_alignnet_body0 = _orig_alg_body0
    samm.alignnet_t_context = _orig_tctx_fn
    _layers.InstanceNorm2d.__call__ = _orig_in_call
    while restore_extra:
        restore_extra.pop()()


_orig_alignnet_call = samm.AlignNet.__call__
_orig_spm_call = samm.SPMWarp.__call__


def apply_variant(name, opt):
    restore()
    if name.startswith("noscale"):
        # stub the whole SPMWarp at ONE resolution: identity target, zero
        # flow, alpha 0.5 — locates WHICH scale the batch collapse lives at
        size = int(name[len("noscale"):])

        def spm(self, source, target, aligned_coarse=None):
            if source.shape[1] != size:
                return _orig_spm_call(self, source, target, aligned_coarse)
            b, h, w, _ = source.shape
            z = jnp.zeros((b, h, w, 1), source.dtype)
            return target, jnp.concatenate(
                [z, z, jnp.full((b, h, w, 1), 0.5, source.dtype)], axis=-1)

        samm.SPMWarp.__call__ = spm
        return opt
    if name.startswith("nowarp") and name != "nowarp":
        # stub ONLY the warp+blend at ONE scale (both formulations), keeping
        # the rest of that scale's SAMM: per-scale warp cost decomposition
        size = int(name[len("nowarp"):])

        def wbp(target, grid, alpha, p, _o=_orig_wbp):
            return target if target.shape[1] == size else _o(target, grid,
                                                             alpha, p)

        def gsb(target, grid, _o=_orig_warp):
            return target if target.shape[1] == size else _o(target, grid)

        samm.warp_blend_platform = wbp
        samm.grid_sample_bilinear = gsb
        return opt
    if name == "cycle1":
        opt = dict(opt, cycle_align=1)
    elif name == "nobody0":
        # NOTE: dead on the DEFAULT path — OGI_SAMM_ALGEBRAIC=1 routes body0
        # through fused_entry -> algebraic_alignnet_body0, not __call__
        # (r4 finding: this variant measured +0.1 ms). Use nobody0alg.
        def btn(self, x):
            if self.in_ch == self.depth:
                return x  # body0 (2C->2C) becomes identity
            return _orig_btn_call(self, x)
        samm._XavierBottleneckIR.__call__ = btn
    elif name == "nobody0alg":
        # stub the WHOLE algebraic body0 (moments+coeffs+convs+norm2+short-
        # cut) with a shape-correct concat — the proper r4 body0 ablation
        samm.alignnet_t_context = lambda *a, **k: None
        samm.algebraic_alignnet_body0 = (
            lambda s, t, g1, b1, k1, alpha, k2, g2, b2,
            diff_f_and_g=True, eps=1e-5, t_ctx=None:
            jnp.concatenate([s - t, t], axis=-1))
    elif name == "noconv":
        # zero out ONLY the three body0 convs inside the algebraic path
        # (moments/coeffs/norm2 stay): isolates the MXU conv cost
        from ood_gan_inversion_tpu.ops import pallas_kernels as pk
        pk_orig = pk._an_conv
        pk._an_conv = lambda v, k: jnp.zeros(
            v.shape[:3] + (k.shape[-1],), v.dtype)
        restore_extra.append(lambda: setattr(pk, "_an_conv", pk_orig))
    elif name == "nobody1":
        def btn(self, x):
            if self.in_ch != self.depth:
                return x[..., :3]  # body1 (2C->3) becomes a slice
            return _orig_btn_call(self, x)
        samm._XavierBottleneckIR.__call__ = btn
    elif name == "noblur":
        samm.fir_blur = lambda x, k, pad: x
    elif name == "nowarp":
        # both warp formulations: the XLA gather (b=1 default) and the MXU
        # kernel behind warp_blend_platform (auto-on at batch >= 2 on TPU)
        samm.grid_sample_bilinear = lambda target, grid: target
        samm.warp_blend_platform = lambda target, grid, alpha, p: target
    elif name == "nomerge":
        samm.SPMWarp._upsample_add = lambda self, coarse, align: align
    elif name == "nonorm":
        # strip every SAMM InstanceNorm (entry + body norms) but keep the
        # convs: isolates the reduction/cast soup from the MXU work.
        # (requires OGI_SAMM_ALGEBRAIC=0 so the module path runs the INs)
        from ood_gan_inversion_tpu.nn import layers
        layers.InstanceNorm2d.__call__ = lambda self, x: x
    return opt


def run(name):
    opt = apply_variant(name, OPT)
    net = build_network(opt)
    from ood_gan_inversion_tpu.utils.host_init import cpu_init_params
    from ood_gan_inversion_tpu.utils.timing import (tree_sum,
                                                    device_ms_per_call)
    params = jax.device_put(cpu_init_params(opt, (1, 1024, 1024, 3)), tpu)
    fwd = jax.jit(lambda p, xx, k: tree_sum(net.apply(
        {"params": p}, xx, mod_size=256, rngs={"noise": k})))
    keys = [jax.random.PRNGKey(100 + i) for i in range(16)]
    for b in BATCHES:
        x_host = np.random.RandomState(0).randn(b, 1024, 1024, 3).astype(
            np.float32)
        x = jax.device_put(jnp.asarray(x_host), tpu)
        t0 = time.time()
        float(np.asarray(fwd(params, x, keys[0])))
        comp = time.time() - t0
        n2 = max(5, 13 // b)
        ms, _ = device_ms_per_call(fwd, [(params, x, k) for k in keys],
                                   windows=3, pair=(2, n2))
        print(f"{name:10s} b={b}  {ms:8.1f} ms/step  {ms / b:7.2f} ms/img  "
              f"(compile {comp:.0f}s)", file=sys.stderr, flush=True)


for v in VARIANTS:
    run(v)
restore()
