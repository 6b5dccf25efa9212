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
    """
    k = np.asarray(FIXED_COEFFS[Colorspace(cs)], dtype=np.int32)  # (3,4)
    half = jnp.int32(1 << (FIXED_SHIFT - 1))
    r = rgba[..., 0].astype(jnp.int32)
    g = rgba[..., 1].astype(jnp.int32)
    b = rgba[..., 2].astype(jnp.int32)
    outs = []
    for i in range(3):
        acc = k[i, 0] * r + k[i, 1] * g + k[i, 2] * b + jnp.int32(int(k[i, 3]) + 0)
        q = jnp.right_shift(acc + half, FIXED_SHIFT)
        outs.append(jnp.clip(q, 0, 255).astype(jnp.uint8))
    return jnp.stack(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("cs",))
def luma_fixed(rgba: jax.Array, cs: int) -> jax.Array:
    """Fixed-point luma ``K_r*r + K_g*g + K_b*b`` as int32 (scale 255*2^20).

    Shared by the zebra / false-color overlays
    (reference data/zebra.effect:29, data/falsecolor.effect:33).
    int32 is safe: max = 255 * 2^20 ~ 2.7e8 < 2^31.
    """
    kr, kg, kb = LUMA_COEF[Colorspace(cs)]
    scale = 1 << FIXED_SHIFT
    K = [jnp.int32(int(round(c * scale))) for c in (kr, kg, kb)]
    r = rgba[..., 0].astype(jnp.int32)
    g = rgba[..., 1].astype(jnp.int32)
    b = rgba[..., 2].astype(jnp.int32)
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

    # The sample position (i + 0.5)*s - 0.5 = i*s + (s-1)/2 is an arithmetic
    # sequence with stride s: for odd s it lands exactly on a texel (nearest
    # read); for even s it is the midpoint of texels i*s + s/2 - 1 and +1
    # (0.5/0.5 blend).  Strided slices instead of a gather — XLA-friendly.
    def axis_reduce(img, axis: int, n_out: int):
        if scale % 2:
            a = (scale - 1) // 2
            idx = [slice(None)] * img.ndim
            idx[axis] = slice(a, a + (n_out - 1) * scale + 1, scale)
            return img[tuple(idx)]
        a = scale // 2 - 1
        idx_lo = [slice(None)] * img.ndim
        idx_lo[axis] = slice(a, a + (n_out - 1) * scale + 1, scale)
        idx_hi = list(idx_lo)
        idx_hi[axis] = slice(a + 1, a + 1 + (n_out - 1) * scale + 1, scale)
        return (img[tuple(idx_lo)] + img[tuple(idx_hi)]) * np.float32(0.5)

    img = rgba.astype(jnp.float32)
    img = axis_reduce(img, rgba.ndim - 3, oh)
    img = axis_reduce(img, rgba.ndim - 2, ow)
    # quantize_unorm8 on the already-0..255 value: clip + round-half-up
    out = jnp.clip(img / np.float32(255.0), 0.0, 1.0)
    return jnp.floor(out * np.float32(255.0) + np.float32(0.5)).astype(jnp.uint8)


def roi_crop(rgba: jax.Array, x0: int, y0: int, x1: int, y1: int) -> jax.Array:
    """Static ROI sub-rect (reference src/common.c:273-282)."""
    return rgba[..., y0:y1, x0:x1, :]
