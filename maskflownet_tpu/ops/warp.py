"""Bilinear backward warping (NHWC, flow in (dy, dx) row/col pixel units).

Semantic contract (replicates MXNet ``F.GridGenerator(transform_type='warp')``
+ ``F.BilinearSampler``, reference ``network/layer.py:8-30``):

  * ``backwarp(img, flow)[n, y, x, c]`` bilinearly samples
    ``img[n, y + flow[n,y,x,0], x + flow[n,y,x,1], c]``.
  * Out-of-bounds corner pixels contribute **zero** (BilinearSampler zero
    padding). This is the plain ``Reconstruction2D`` variant.
  * ``backwarp(img, flow, clamp=True)`` first clamps the sample coordinates to
    the image rectangle (the reference's ``Reconstruction2DSmooth``, which
    clips the normalized grid to [-1, 1], ``network/layer.py:29``).

Flow channel convention: this framework uses (dy, dx) everywhere internally,
equal to the reference's *post-flip* label order (``pipeline.py:105``). The
reference's pre-GridGenerator ``flow.flip(axis=1)`` (``layer.py:17``) converts
its (dy, dx) model flow to MXNet's (dx, dy) grid order; here no flip exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_nhwc(img: Array, iy: Array, ix: Array) -> Array:
    """img: (N,H,W,C); iy/ix: (N,Ho,Wo) int32 (assumed in-bounds). -> (N,Ho,Wo,C)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix  # (N,Ho,Wo)
    return jnp.take_along_axis(
        flat[:, :, :], idx.reshape(n, -1, 1), axis=1
    ).reshape(idx.shape + (c,))


def unfold_patches(img: Array, y0: Array, x0: Array, win: int) -> Array:
    """Gather ``win x win`` pixel patches with top-left corners (y0, x0).

    TPU-native gather formulation: this backend's gather throughput is
    descriptor-bound (measured ~5x faster pulling one 16C-wide slice than
    sixteen C-wide ones at level-2 shapes, benchmarks/deform_ab.py), so the
    image is first *unfolded* -- every padded pixel's row holds its whole
    (win, win, C) neighborhood -- and each output pixel issues ONE
    ``take_along_axis`` row gather. The unfold is pure shifted-copy streaming
    (~free), and its autodiff transpose is shifted adds (no extra scatter).

    Zero out-of-bounds semantics come out exactly without masks: the image is
    zero-padded by ``win`` on each side and patch corners clipped to the
    padded interior, so any fully- or partially-out-of-bounds window reads
    zeros for its out-of-bounds pixels.

    img: (N,H,W,C); y0/x0: (N,Ho,Wo) int32 window origins (may be far out of
    bounds). -> (N, Ho, Wo, win, win, C).
    """
    n, h, w, c = img.shape
    pad = win
    hp, wp = h + 2 * pad, w + 2 * pad
    nrow, ncol = hp - win + 1, wp - win + 1
    xp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = jnp.stack([xp[:, :, v:v + ncol, :] for v in range(win)], axis=3)
    xu = jnp.stack([cols[:, u:u + nrow] for u in range(win)], axis=3)
    xu = xu.reshape(n, nrow * ncol, win * win * c)
    yy = jnp.clip(y0 + pad, 0, nrow - 1)
    xx = jnp.clip(x0 + pad, 0, ncol - 1)
    idx = (yy * ncol + xx).reshape(n, -1, 1)
    patch = jnp.take_along_axis(xu, idx, axis=1)
    return patch.reshape(y0.shape + (win, win, c))


def _unfold_sample(img: Array, sy: Array, sx: Array) -> Array:
    """Bilinear sampling via one unfolded 2x2-patch gather per pixel."""
    dtype = img.dtype
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None].astype(dtype)
    fx = (sx - x0)[..., None].astype(dtype)
    p = unfold_patches(img, y0.astype(jnp.int32), x0.astype(jnp.int32), 2)
    top = p[..., 0, 0, :] * (1 - fx) + p[..., 0, 1, :] * fx
    bot = p[..., 1, 0, :] * (1 - fx) + p[..., 1, 1, :] * fx
    return top * (1 - fy) + bot * fy


def _onehot_sample(img: Array, sy: Array, sx: Array,
                   row_tile: int = 16) -> Array:
    """Bilinear sample via two one-hot contractions on the MXU.

    TPU-native formulation: per-pixel gathers serialize on TPU (XLA lowers
    them to scalar loop nests), but the bilinear kernel ``max(0, 1-|s-i|)``
    *is* a one-hot matrix with the interpolation weights as its two nonzeros,
    so sampling = (P,H) x (H,W*C) matmul (row interpolation) followed by a
    per-pixel weighted reduction over W (column interpolation). Both stages
    are dense MXU/VPU work; the autodiff transpose is again matmuls, so the
    backward pass avoids TPU scatter entirely. Zero-padding semantics match
    the gather path exactly (weights vanish outside [0, dim-1]).

    Output rows are processed in ``row_tile`` tiles under ``lax.scan`` to
    bound the (N, P, W, C) stage-1 intermediate.
    """
    n, h, w, c = img.shape
    _, ho, wo = sy.shape
    dtype = img.dtype
    img_flat = img.reshape(n, h, w * c)
    hh = jnp.arange(h, dtype=jnp.float32)
    ww = jnp.arange(w, dtype=jnp.float32)

    rt = min(row_tile, ho)
    pad = (-ho) % rt
    if pad:
        # padded rows sample far outside -> all-zero weights -> zero output
        sy = jnp.pad(sy, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0)
        sx = jnp.pad(sx, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0)
    nt = (ho + pad) // rt
    sy_t = sy.reshape(n, nt, rt * wo).transpose(1, 0, 2)
    sx_t = sx.reshape(n, nt, rt * wo).transpose(1, 0, 2)

    def tile(_, t):
        syt, sxt = t  # each (N, P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(syt[..., None] - hh)).astype(dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sxt[..., None] - ww)).astype(dtype)
        rows = jax.lax.dot_general(  # (N,P,H) @ (N,H,W*C) -> (N,P,W*C)
            wy, img_flat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype)
        rows = rows.reshape(rows.shape[0], rows.shape[1], w, c)
        return None, jnp.einsum("npw,npwc->npc", wx, rows)

    _, outs = jax.lax.scan(tile, None, (sy_t, sx_t))  # (nt, N, P, C)
    out = outs.transpose(1, 0, 2, 3).reshape(n, nt * rt, wo, c)
    return out[:, :ho] if pad else out


def backwarp_coords(img: Array, sy: Array, sx: Array, *, clamp: bool = False,
                    method: str = "auto") -> Array:
    """Bilinear sample ``img`` (N,H,W,C) at float coords (sy, sx), each (N,Ho,Wo).

    ``method``: 'gather' (4-corner take_along_axis; best off-TPU), 'onehot'
    (MXU matmul formulation; best on TPU), or 'auto'.
    """
    if method == "auto":
        import os
        # Measured (benchmarks/deform_ab.py): on TPU, gather cost is
        # descriptor-bound, so 'unfold' (one wide patch gather per pixel)
        # beats 'gather' (4 corner gathers); off-TPU 'gather' wins. 'onehot'
        # (MXU matmuls) loses to both here (scan-residual HBM traffic).
        # MFN_WARP overrides for A/B experiments.
        default = "unfold" if jax.default_backend() == "tpu" else "gather"
        method = os.environ.get("MFN_WARP", default)
    if method == "unfold":
        sy = sy.astype(jnp.float32)
        sx = sx.astype(jnp.float32)
        if clamp:
            h, w = img.shape[1], img.shape[2]
            sy = jnp.clip(sy, 0.0, h - 1.0)
            sx = jnp.clip(sx, 0.0, w - 1.0)
        return _unfold_sample(img, sy, sx)
    if method == "onehot":
        sy = sy.astype(jnp.float32)
        sx = sx.astype(jnp.float32)
        if clamp:
            h, w = img.shape[1], img.shape[2]
            sy = jnp.clip(sy, 0.0, h - 1.0)
            sx = jnp.clip(sx, 0.0, w - 1.0)
        return _onehot_sample(img, sy, sx)
    n, h, w, c = img.shape
    compute_dtype = img.dtype
    sy = sy.astype(jnp.float32)
    sx = sx.astype(jnp.float32)
    if clamp:
        sy = jnp.clip(sy, 0.0, h - 1.0)
        sx = jnp.clip(sx, 0.0, w - 1.0)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None].astype(compute_dtype)
    wx = (sx - x0)[..., None].astype(compute_dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0i + dy
            xx = x0i + dx
            if clamp:
                valid = None
            else:
                valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
            yyc = jnp.clip(yy, 0, h - 1)
            xxc = jnp.clip(xx, 0, w - 1)
            v = _gather_nhwc(img, yyc, xxc)
            if valid is not None:
                v = jnp.where(valid, v, jnp.zeros((), compute_dtype))
            wgt = (wy if dy else (1 - wy)) * (wx if dx else (1 - wx))
            contrib = v * wgt
            out = contrib if out is None else out + contrib
    return out


def backwarp(img: Array, flow: Array, *, clamp: bool = False,
             method: str = "auto") -> Array:
    """Backward-warp ``img`` (N,H,W,C) by ``flow`` (N,H,W,2) in (dy, dx) pixels."""
    n, h, w, _ = img.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    sy = gy + flow[..., 0].astype(jnp.float32)
    sx = gx + flow[..., 1].astype(jnp.float32)
    return backwarp_coords(img, sy, sx, clamp=clamp, method=method)


def affine_grid(theta: Array, height: int, width: int) -> tuple[Array, Array]:
    """Normalized affine sampling grid (MXNet ``GridGenerator('affine')``).

    ``theta``: (N, 6) rows ``[a, b, tx, c, d, ty]``. Target coords are
    ``x_t, y_t`` in [-1, 1] inclusive (align-corners). Returns normalized
    source coords (gx, gy), each (N, H, W):
    ``gx = a*x_t + b*y_t + tx``, ``gy = c*x_t + d*y_t + ty``.
    Reference use: ``augmentation.py:60,306,317,333``.
    """
    ys = jnp.linspace(-1.0, 1.0, height, dtype=jnp.float32)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=jnp.float32)
    y_t, x_t = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    t = theta.astype(jnp.float32)
    gx = t[:, 0, None, None] * x_t + t[:, 1, None, None] * y_t + t[:, 2, None, None]
    gy = t[:, 3, None, None] * x_t + t[:, 4, None, None] * y_t + t[:, 5, None, None]
    return gx, gy


def grid_sample_normalized(img: Array, gx: Array, gy: Array,
                           *, clamp: bool = False,
                           method: str = "auto") -> Array:
    """Bilinear sample with normalized [-1,1] coords (MXNet BilinearSampler).

    ``sx = (gx + 1) * (W - 1) / 2``; zero padding outside unless ``clamp``.
    """
    n, h, w, c = img.shape
    sx = (gx + 1.0) * ((w - 1) / 2.0)
    sy = (gy + 1.0) * ((h - 1) / 2.0)
    return backwarp_coords(img, sy, sx, clamp=clamp, method=method)
