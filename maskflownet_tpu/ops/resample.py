"""Triangle-kernel resampling (NHWC) and bilinear resize.

``upsample(img, f)`` replicates the reference ``Upsample`` block
(``network/MaskFlownet.py:35-62``): edge-pad one row/col bottom-right, then a
transposed conv with the separable triangle kernel of size 2f-1, stride f,
pad f-1, cropped by one. Algebraically this is exact 1-D linear interpolation
per axis with ``out[f*i + r] = ((f-r)*x[i] + r*x[i+1]) / f`` (edge-clamped at
the bottom/right border), so we implement it as a separable lerp --
O(H*W) elementwise work instead of a (2f-1)^2 convolution. For f=64 (the
multiscale loss upsampler, ``MaskFlownet.py:594-597``) a naive port would
convolve with a 127x127 kernel; this form is ~4000x cheaper and exact.

``downsample(img, f)`` replicates ``Downsample`` (``MaskFlownet.py:6-33``):
triangle-kernel (size f+1, stride f, pad f/2) anti-aliased average,
renormalized by the same convolution applied to ones (boundary correction).

``resize_bilinear`` replicates ``nd.contrib.BilinearResize2D``
(align-corners=True, used at reference ``pipeline.py:129-142``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _upsample_axis(x: Array, f: int, axis: int) -> Array:
    """Exact triangle-kernel (linear) upsample along one spatial axis."""
    x = jnp.moveaxis(x, axis, 1)  # (N, L, ...)
    nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)  # edge pad
    t = (jnp.arange(f, dtype=x.dtype) / f).reshape((1, 1, f) + (1,) * (x.ndim - 2))
    out = x[:, :, None] * (1 - t) + nxt[:, :, None] * t  # (N, L, f, ...)
    out = out.reshape((x.shape[0], x.shape[1] * f) + x.shape[2:])
    return jnp.moveaxis(out, 1, axis)


def upsample(img: Array, factor: int) -> Array:
    """(N,H,W,C) -> (N, H*factor, W*factor, C); values are interpolated, not
    rescaled (flow magnitudes keep their units, as in the reference)."""
    if factor == 1:
        return img
    img = _upsample_axis(img, factor, 1)
    img = _upsample_axis(img, factor, 2)
    return img


@functools.lru_cache(maxsize=None)
def _triangle_kernel(f: int) -> tuple:
    # pure numpy: jnp.arange under a jit trace yields tracers, and float()
    # on a tracer raises ConcretizationTypeError -- this kernel must stay a
    # compile-time constant (downsample runs inside the jitted train step
    # for the 'downsampling' loss match)
    import numpy as _np
    w = f // 2
    k = ((w + 1) - _np.abs(w - _np.arange(0, 2 * w + 1, dtype=_np.float32))) \
        / (2 * w + 1)
    return tuple(float(v) for v in k)


def downsample(img: Array, factor: int) -> Array:
    """(N,H,W,C) -> (N, H//factor, W//factor, C) anti-aliased triangle mean."""
    if factor == 1:
        return img
    n, h, w, c = img.shape
    k1 = jnp.asarray(_triangle_kernel(factor), dtype=img.dtype)
    k2 = (k1[:, None] * k1[None, :])[:, :, None, None]  # (f+1, f+1, 1, 1)
    kdw = jnp.tile(k2, (1, 1, 1, c))  # depthwise (f+1, f+1, 1, C)
    pad = factor // 2
    args = dict(window_strides=(factor, factor), padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c, preferred_element_type=img.dtype)
    num = lax.conv_general_dilated(img, kdw, **args)
    den = lax.conv_general_dilated(jnp.ones_like(img), kdw, **args)
    return num / den


def resize_bilinear(img: Array, height: int, width: int) -> Array:
    """Align-corners bilinear resize (MXNet ``BilinearResize2D`` semantics)."""
    n, h, w, c = img.shape
    if (h, w) == (height, width):
        return img
    ys = jnp.linspace(0.0, h - 1.0, height, dtype=jnp.float32)
    xs = jnp.linspace(0.0, w - 1.0, width, dtype=jnp.float32)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2) if h > 1 else jnp.zeros_like(ys, jnp.int32)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2) if w > 1 else jnp.zeros_like(xs, jnp.int32)
    wy = (ys - y0).astype(img.dtype) if h > 1 else jnp.zeros_like(ys, img.dtype)
    wx = (xs - x0).astype(img.dtype) if w > 1 else jnp.zeros_like(xs, img.dtype)

    top = jnp.take(img, y0, axis=1)
    bot = jnp.take(img, jnp.minimum(y0 + 1, h - 1), axis=1)
    vert = top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    left = jnp.take(vert, x0, axis=2)
    right = jnp.take(vert, jnp.minimum(x0 + 1, w - 1), axis=2)
    return left * (1 - wx)[None, None, :, None] + right * wx[None, None, :, None]
