"""MXU warp kernel vs the XLA reference formulation (interpret mode).

The kernel replaces the gather-based grid_sample + alpha blend inside
SPMWarp (nn/samm.py; reference SAMM/helpers.py:170-177) for bounded flows.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ood_gan_inversion_tpu.ops import pallas_warp as pw


def _mk(b, size, c, scale, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, size, size, c), dtype)
    lin = jnp.linspace(-1.0, 1.0, size, dtype=jnp.float32)
    base_x = jnp.broadcast_to(lin[None, :], (size, size))
    base_y = jnp.broadcast_to(lin[:, None], (size, size))
    dx = jnp.asarray(np.tanh(rs.randn(b, size, size)) * scale, jnp.float32)
    dy = jnp.asarray(np.tanh(rs.randn(b, size, size)) * scale, jnp.float32)
    grid = jnp.stack([base_x[None] + dx, base_y[None] + dy], axis=-1)
    alpha = jnp.asarray(rs.rand(b, size, size, 1), jnp.float32)
    return x, grid, alpha


@pytest.mark.parametrize("b,size,c,scale", [
    (1, 32, 128, 0.08),
    (2, 64, 128, 0.08),
    (1, 32, 256, 0.02),
])
def test_matches_reference(b, size, c, scale):
    x, grid, alpha = _mk(b, size, c, scale)
    p = pw.max_disp_px(scale, size)
    assert pw.mxu_warp_supported(size, size, c, p)
    ref = pw.warp_blend_reference(x, grid, alpha)
    out = pw._warp_blend_fwd(x, grid, alpha, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_extreme_flow_at_bound():
    """Flow pinned at +-scale (the clip bound) plus border pixels: the
    zero-padding semantics and window bounds must still match."""
    b, size, c, scale = 1, 32, 128, 0.1
    x, grid, alpha = _mk(b, size, c, scale, seed=3)
    rs = np.random.RandomState(4)
    sign = jnp.asarray(np.sign(rs.randn(b, size, size, 2)), jnp.float32)
    lin = jnp.linspace(-1.0, 1.0, size, dtype=jnp.float32)
    base = jnp.stack([jnp.broadcast_to(lin[None, :], (size, size)),
                      jnp.broadcast_to(lin[:, None], (size, size))],
                     axis=-1)
    grid = base[None] + sign * scale
    p = pw.max_disp_px(scale, size)
    ref = pw.warp_blend_reference(x, grid, alpha)
    out = pw._warp_blend_fwd(x, grid, alpha, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    b, size, c, scale = 1, 32, 128, 0.08
    x, grid, alpha = _mk(b, size, c, scale, seed=7)
    p = pw.max_disp_px(scale, size)

    def loss_k(x, grid, alpha):
        # interpret-mode forward with the custom_vjp backward
        out = pw.mxu_warp_blend(x, grid, alpha, p)
        return jnp.sum(out * out)

    def loss_r(x, grid, alpha):
        out = pw.warp_blend_reference(x, grid, alpha)
        return jnp.sum(out * out)

    # value check through the public entry (non-interpret path would need a
    # TPU; the vjp recomputes the reference so only grads are asserted here)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, grid, alpha)
    _, vjp = jax.vjp(pw.warp_blend_reference, x, grid, alpha)
    ref_out = pw.warp_blend_reference(x, grid, alpha)
    gk = vjp(2.0 * ref_out)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-5)


def test_vmem_rule_matches_probe():
    # Probed on the real compiler (tools/prof/probe_warp_vmem.py): the
    # 256px/c=128 SAMM scale fits scoped VMEM at every batch, the
    # 128px/c=256 scale blows the 16 MB limit (19.03M) even at b=4 in
    # fp32 — and fits again with bf16 features (half the row window).
    assert pw.mxu_warp_supported(256, 256, 128, pw.max_disp_px(0.08, 256), 4)
    assert not pw.mxu_warp_supported(128, 128, 256,
                                     pw.max_disp_px(0.08, 128), 4)
    assert pw.mxu_warp_supported(128, 128, 256, pw.max_disp_px(0.08, 128), 2)


def test_auto_policy_batch_and_backend_gated(monkeypatch):
    from ood_gan_inversion_tpu.nn import samm
    monkeypatch.setattr(samm, "_MXU_WARP", "auto")
    monkeypatch.setattr(samm, "_MXU_WARP_BATCH", 2)
    # CPU backend (the test suite's forced backend): auto must stay off so
    # tests and dryrun_multichip never lower a TPU Pallas call on CPU.
    assert jax.default_backend() == "cpu"
    assert not samm.use_mxu_warp(8)
    # forced-on (the prof scripts' monkeypatch) wins over the backend gate
    monkeypatch.setattr(samm, "_MXU_WARP", True)
    assert samm.use_mxu_warp(1)
    monkeypatch.setattr(samm, "_MXU_WARP", False)
    assert not samm.use_mxu_warp(8)


def test_platform_dispatch_cpu_lowering(monkeypatch):
    """Regression (round 3): a trace whose gate picked the kernel can still
    be LOWERED for CPU — param init under jax.default_device(cpu) on an
    axon session, prof tools — and must fall back to the XLA reference via
    lax.platform_dependent instead of dying in Mosaic's cpu_lowering."""
    x, grid, alpha = _mk(2, 64, 128, 0.08)
    p = pw.max_disp_px(0.08, 64)
    assert jax.default_backend() == "cpu"
    out = jax.jit(lambda t, g, a: pw.warp_blend_platform(t, g, a, p))(
        x, grid, alpha)
    ref = pw.warp_blend_reference(x, grid, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # gradients flow through the platform_dependent branch select
    g1 = jax.grad(lambda t: pw.warp_blend_platform(t, grid, alpha, p).sum())(x)
    g2 = jax.grad(lambda t: pw.warp_blend_reference(t, grid, alpha).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_forced_warp_full_samm_on_cpu(monkeypatch):
    """The exact crash shape from prof_train_decomp (PERF r3): force the
    gate ON, run a full SPMWarp alignment on the CPU backend — the
    platform dispatch must take the reference path and execute."""
    from ood_gan_inversion_tpu.nn import samm
    monkeypatch.setattr(samm, "_MXU_WARP", True)
    monkeypatch.setattr(samm, "_MXU_WARP_MIN", 8)
    mod = samm.SPMWarp(in_ch=16, scale=0.08, cycle_align=2)
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randn(2, 32, 32, 16), jnp.float32)
    tgt = jnp.asarray(rs.randn(2, 32, 32, 16), jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), src, tgt)
    out, align = mod.apply(vs, src, tgt)
    assert np.isfinite(np.asarray(out)).all()
    assert align.shape == (2, 32, 32, 3)


def test_bf16_cast_warp_parity_dense_channels():
    """The 128px/c=256 SAMM scale: fp32 row window blows scoped VMEM, bf16
    fits (probe). The bf16-cast path (nn/samm.py dispatch) must match the
    fp32 reference to bf16-rounding tolerance."""
    b, size, c, scale = 2, 128, 256, 0.08
    x, grid, alpha = _mk(b, size, c, scale)
    p = pw.max_disp_px(scale, size)
    assert not pw.mxu_warp_supported(size, size, c, p, 4)
    assert pw.mxu_warp_supported(size, size, c, p, 2)
    ref = pw.warp_blend_reference(x, grid, alpha)
    out = pw._warp_blend_fwd(x.astype(jnp.bfloat16), grid, alpha, p,
                             interpret=True).astype(jnp.float32)
    d = float(jnp.abs(out - ref).max())
    r = float(ref.max() - ref.min())
    assert d / r < 0.01, (d, r)


@pytest.mark.parametrize("version", [2, 3, 4])
def test_alt_kernel_versions_match_reference(version):
    """r5 formulation battery (PERF.md r5): v2 (per-source-row folded
    selection), v3 (x-tiled v1), v4 (natural-layout v2) must all match the
    reference formulation exactly; v1 stays the shipped default on the
    measured A/Bs."""
    b, size, c, scale = 2, 64, 128, 0.08
    x, grid, alpha = _mk(b, size, c, scale, seed=11)
    p = pw.max_disp_px(scale, size)
    assert pw.warp_tile(size, p) > 0
    ref = pw.warp_blend_reference(x, grid, alpha)
    out = pw._warp_blend_fwd(x, grid, alpha, p, interpret=True,
                             version=version)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
