"""Device-side color conversion and capture-path ops (JAX).

Replaces the reference's GPU conversion pass + staging readback
(reference src/common.c:170-221, data/common.effect:23-43): frames stay in
HBM, the conversion is exact 20-bit fixed point (see colorspace.py), and
nothing ever leaves the device until a scope's tiny result is fetched.

All functions are jittable and shape-polymorphic over leading batch dims.
The colorspace is a *static* argument (selects constants at trace time),
matching XLA's everything-static compilation model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..colorspace import Colorspace, FIXED_COEFFS, FIXED_SHIFT, LUMA_COEF


@functools.partial(jax.jit, static_argnames=("cs",))
def rgb_to_yuv_u8(rgba: jax.Array, cs: int) -> jax.Array:
    """Quantized RGB->YUV, bit-exact vs golden.rgb_to_yuv_u8.

    rgba: uint8 (..., 4) -> uint8 (..., 3) in Y,U,V order.

    Computed in float32: with the 2^12 coefficient scale every product and
    sum is an integer < 2^22 (exactly representable), so this matches the
    golden model's int64 arithmetic bit-for-bit while using the fast f32
    VPU path (int32 multiplies are emulated and ~20x slower on TPU).
    """
    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], dtype=np.float32)  # (3,4)
    half = np.float32(1 << (FIXED_SHIFT - 1))
    inv = np.float32(1.0 / (1 << FIXED_SHIFT))  # power of two: exact scaling
    r = rgba[..., 0].astype(jnp.float32)
    g = rgba[..., 1].astype(jnp.float32)
    b = rgba[..., 2].astype(jnp.float32)
    outs = []
    for i in range(3):
        acc = k[i, 0] * r + k[i, 1] * g + k[i, 2] * b + np.float32(k[i, 3] + half)
        q = jnp.floor(acc * inv)
        outs.append(jnp.clip(q, 0.0, 255.0).astype(jnp.uint8))
    return jnp.stack(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("cs",))
def luma_fixed(rgba: jax.Array, cs: int) -> jax.Array:
    """Fixed-point luma ``K_r*r + K_g*g + K_b*b`` (scale 255*2^12), as an
    integer-valued float32 (exact: < 2^21; f32 mults are fast, int32 slow).

    Shared by the zebra / false-color overlays
    (reference data/zebra.effect:29, data/falsecolor.effect:33).
    """
    kr, kg, kb = LUMA_COEF[Colorspace(cs)]
    scale = 1 << FIXED_SHIFT
    K = [np.float32(int(round(c * scale))) for c in (kr, kg, kb)]
    r = rgba[..., 0].astype(jnp.float32)
    g = rgba[..., 1].astype(jnp.float32)
    b = rgba[..., 2].astype(jnp.float32)
    return K[0] * r + K[1] * g + K[2] * b


@functools.partial(jax.jit, static_argnames=("scale",))
def downscale(rgba: jax.Array, scale: int) -> jax.Array:
    """Integer-factor bilinear pre-downscale, bit-exact vs golden.downscale.

    Implements the reference's target_scale texrender shrink
    (reference src/common.c:141-168,249-250) as a separable 2-tap gather.
    Works on (..., H, W, 4) uint8.
    """
    if scale <= 1:
        return rgba
    h, w = rgba.shape[-3], rgba.shape[-2]
    oh, ow = h // scale, w // scale
    if oh == 0 or ow == 0:
        raise ValueError(f"frame {w}x{h} too small for scale {scale}")

    # The sample position (i + 0.5)*s - 0.5 = i*s + (s-1)/2: for odd s it
    # lands exactly on a texel (nearest read); for even s it is the midpoint
    # of texels i*s + s/2 - 1 and +1, i.e. out = floor((a+b+c+d+2)/4) of the
    # middle 2x2 — pure integer math, bit-identical to the golden model's
    # float path (all its intermediates are exact quarters < 2^10).
    # Reshape-to-blocks instead of stride-s slices (strided lane access
    # forces slow relayouts on TPU).
    x = rgba[..., : oh * scale, : ow * scale, :]
    blocks = x.reshape(x.shape[:-3] + (oh, scale, ow, scale, 4))
    if scale % 2:
        m = (scale - 1) // 2
        return blocks[..., :, m, :, m, :]
    a = scale // 2 - 1
    q = blocks[..., :, a : a + 2, :, a : a + 2, :].astype(jnp.int32)
    s = q[..., 0, :, 0, :] + q[..., 0, :, 1, :] + q[..., 1, :, 0, :] + q[..., 1, :, 1, :]
    return ((s + 2) >> 2).astype(jnp.uint8)


def roi_crop(rgba: jax.Array, x0: int, y0: int, x1: int, y1: int) -> jax.Array:
    """Static ROI sub-rect (reference src/common.c:273-282)."""
    return rgba[..., y0:y1, x0:x1, :]
