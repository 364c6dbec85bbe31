"""Polyphase (space-to-depth) packing of the high-resolution generator tail.

The MXU is a 128x128 systolic array: the reference generator's 512/1024 px
stages (src/ops/StyleGAN/model.py:435-457, channel table L402-412) run 3x3
convs with only 32-64 channels, wasting 3/4 of the MXU lanes and paying fp32
HBM round-trips on 134 MB activations. Measured on one v5e, the 1024px stage
alone costs 8.4 ms of the 15.6 ms batch-1 decode (PERF.md).

This module rewrites each high-res stage as coarse-resolution convs over
phase-packed channels (channel layout: packed_c = (py*2+px)*C + c):

  * modulated upsample-conv (lhs_dilation=2, flip kernel, pad k-1) followed by
    the (1,3,3,1) FIR blur — the exact chain in ops/modulated.py:102-119 —
    becomes ONE 3x3 coarse conv Cin -> 4*Cout with the composite kernel
      K1[py,px][dy,dx] = sum_m B4[2-2d+p-m] * W1[m]        (per spatial dim)
    where B4 = 4*make_kernel(blur), derived by polyphase decomposition of
    conv(blur_pad11, conv(flip(W1), pad22(dilate2(x)))).
  * the same-resolution 3x3 conv becomes a 3x3 coarse conv 4C -> 4C with
      K2[e+1][(q,i),(p,o)] = W2[t],  t = 2e + q - p + 1  (when 0 <= t < 3)
  * the 1x1 ToRGB conv becomes a block-diagonal 1x1 conv 4C -> 12
  * the skip-RGB FIR upsample (ops/upfirdn2d.py:177-181, pad (2,1)) becomes a
    3-tap coarse conv with K4[p][d] = B4[p+1-2d] per channel.

All per-channel modulation/demodulation scalings commute with packing (tile
by 4 phase-major). Results are bit-identical linear algebra (parity tested in
tests/test_polyphase.py); only the MXU/HBM mapping changes: K=9*Cin_packed,
N=4*Cout >= 128 fills the MXU, and every elementwise op runs on quarter-size
spatial grids with 4x channels (same bytes, better tiling).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def pack_space_to_depth(x):
    """(B, 2H, 2W, C) -> (B, H, W, 4C), packed channel = (py*2+px)*C + c."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def unpack_depth_to_space(xp, c: int):
    """Inverse of pack_space_to_depth. c = unpacked channel count."""
    b, h, w, c4 = xp.shape
    assert c4 == 4 * c
    x = xp.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _upconv_coeffs(blur_kernel) -> np.ndarray:
    """A[my,mx,dy,dx,py,px] = B4[2-2d+p-m] per spatial dim (numpy const)."""
    b4 = np.asarray(blur_kernel, dtype=np.float64) * 4.0
    assert b4.shape == (4, 4)
    a = np.zeros((3, 3, 3, 3, 2, 2))
    for my in range(3):
        for mx in range(3):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    for py in range(2):
                        for px in range(2):
                            iy = 2 - 2 * dy + py - my
                            ix = 2 - 2 * dx + px - mx
                            if 0 <= iy < 4 and 0 <= ix < 4:
                                a[my, mx, dy + 1, dx + 1, py, px] = b4[iy, ix]
    return a


def upconv_blur_packed_kernel(w1, blur_kernel):
    """Composite kernel for modulated upsample-conv + FIR blur, phase-packed.

    Args:
      w1: (3, 3, Cin, Cout) the he-scaled conv weight (scale already applied).
      blur_kernel: (4, 4) numpy FIR kernel as stored (normalized; the up-gain
        factor**2 = 4 is applied here, matching fir_blur(upsample_factor=2)).
    Returns: (3, 3, Cin, 4*Cout) kernel for a padding-(1,1) coarse conv.

    K1[p][d] = sum_m B4[2-2d+p-m] * W1[m] per spatial dim (d in {-1,0,1}),
    built as ONE einsum against a constant coefficient tensor (hundreds of
    sliced adds measurably slow the jitted forward).
    """
    kh, kw, cin, cout = w1.shape
    assert kh == 3 and kw == 3, "packed tail expects 3x3 styled convs"
    a = jnp.asarray(_upconv_coeffs(blur_kernel), dtype=w1.dtype)
    # (dy,dx,Cin,py,px,Cout) -> (3,3,Cin,4Cout) phase-major
    k = jnp.einsum("yxio,yxdepq->deipqo", w1, a)
    return k.reshape(3, 3, cin, 4 * cout)


def _select_coeffs_conv3x3() -> np.ndarray:
    """S[ty,tx,ey,ex,qy,qx,py,px] = 1 when t = 2e + q - p + 1 per dim."""
    s = np.zeros((3, 3, 3, 3, 2, 2, 2, 2))
    for py in range(2):
        for px in range(2):
            for ty in range(3):
                fy = py + ty - 1
                qy, ey = fy % 2, (fy - (fy % 2)) // 2
                for tx in range(3):
                    fx = px + tx - 1
                    qx, ex = fx % 2, (fx - (fx % 2)) // 2
                    s[ty, tx, ey + 1, ex + 1, qy, qx, py, px] = 1.0
    return s


_SEL3 = _select_coeffs_conv3x3()


def conv3x3_packed_kernel(w2):
    """Same-resolution 3x3 conv kernel, packed 4C -> 4C.

    w2: (3, 3, C, C') he-scaled. Returns (3, 3, 4C, 4C'). One einsum against
    a constant 0/1 selection tensor."""
    kh, kw, ci, co = w2.shape
    assert kh == 3 and kw == 3
    s = jnp.asarray(_SEL3, dtype=w2.dtype)
    # (e,f, qy,qx,Ci, py,px,Co) -> (3,3,4Ci,4Co)
    k = jnp.einsum("yxio,yxefabpq->efabipqo", w2, s)
    return k.reshape(3, 3, 4 * ci, 4 * co)


def conv1x1_packed_kernel(w):
    """1x1 conv (e.g. ToRGB), packed block-diagonal 4C -> 4C'.

    w: (1, 1, C, C'). Returns (1, 1, 4C, 4C')."""
    _, _, ci, co = w.shape
    eye = jnp.asarray(np.eye(4), dtype=w.dtype)
    k = jnp.einsum("io,ab->aibo", w[0, 0], eye)
    return k.reshape(1, 1, 4 * ci, 4 * co)


def skip_up_packed_kernel(blur_kernel, channels: int, dtype=jnp.float32):
    """FIR 2x-upsample of the RGB skip as a packed coarse conv.

    upsample2x pads (2,1): out[r] = sum_u B4[r+1-2u] x[u] per spatial dim,
    so K4[p][d] = B4[p+1-2d], d in {-1,0,1}. Static numpy -> compile const.
    Returns (3, 3, C, 4C) with the depthwise structure expanded densely
    (C=3 -> 324 MACs/px, negligible)."""
    b4 = np.asarray(blur_kernel, dtype=np.float64) * 4.0
    k = np.zeros((3, 3, channels, 4 * channels))
    for py in range(2):
        for px in range(2):
            for dy in range(-1, 2):
                iy = py + 1 - 2 * dy
                if not (0 <= iy < 4):
                    continue
                for dx in range(-1, 2):
                    ix = px + 1 - 2 * dx
                    if not (0 <= ix < 4):
                        continue
                    for c in range(channels):
                        k[dy + 1, dx + 1, c, (py * 2 + px) * channels + c] = \
                            b4[iy, ix]
    return jnp.asarray(k, dtype=dtype)


def conv_packed(x, kernel, padding: int = 1):
    """NHWC coarse conv with the packed kernel."""
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def tile_phase_major(v, reps: int = 4):
    """Tile a per-channel vector (..., C) to packed layout (..., 4C)."""
    return jnp.concatenate([v] * reps, axis=-1)
