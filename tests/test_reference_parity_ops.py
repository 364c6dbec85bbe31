"""GOLDEN op-level parity: our upfirdn2d / fused_leaky_relu vs the
reference's OWN CPU fallback implementations (src/ops/op/upfirdn2d.py:149-193
native path, fused_act.py:92-96) — the exact code the reference executes
without CUDA. test_ops.py checks the same math against independently
re-derived oracles; these pin it to the reference program itself.
"""

import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

sys.path.insert(0, "tests")

from ref_compat import load_reference_module


@pytest.fixture(scope="module")
def ref_op():
    return load_reference_module("src.ops.op")


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0)),
    (2, 1, (2, 1)),        # the Upsample wiring (factor 2, k=4)
    (1, 2, (2, 2)),        # the Downsample wiring
    (2, 1, (1, 1)),        # Blur after conv_transpose
    (1, 1, (2, 1)),
])
def test_upfirdn2d_golden(ref_op, up, down, pad):
    from ood_gan_inversion_tpu.ops.upfirdn2d import upfirdn2d, make_kernel

    rs = np.random.RandomState(up * 10 + down * 3 + pad[0])
    x = rs.randn(2, 11, 13, 3).astype(np.float32)
    k = np.asarray([1.0, 3.0, 3.0, 1.0])
    k2 = make_kernel(k) * (up ** 2 if up > 1 else 1)

    ref = ref_op.upfirdn2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous(),
        torch.from_numpy(np.asarray(k2, np.float32)),
        up=up, down=down, pad=pad)
    got = upfirdn2d(jnp.asarray(x), k2, up=up, down=down, pad=pad)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5, rtol=0)


def test_fused_leaky_relu_golden(ref_op):
    from ood_gan_inversion_tpu.ops.fused_act import fused_leaky_relu

    rs = np.random.RandomState(0)
    x = rs.randn(2, 7, 7, 16).astype(np.float32)
    b = rs.randn(16).astype(np.float32)
    ref = ref_op.fused_leaky_relu(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous(),
        torch.from_numpy(b))
    got = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6, rtol=0)
    # 2D input path (EqualLinear's fused activation, fused_act.py:92-96)
    x2 = rs.randn(5, 16).astype(np.float32)
    ref2 = ref_op.fused_leaky_relu(torch.from_numpy(x2), torch.from_numpy(b))
    got2 = fused_leaky_relu(jnp.asarray(x2), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got2), ref2.numpy(), atol=1e-6,
                               rtol=0)
