"""Windowed Pallas TPU kernel for batched bilinear resampling (NHWC).

Built for the device-side geometric augmentation (``augment/geometry.py``),
whose two grid samplings dominate the train step on TPU when done with
per-pixel gathers. Status (round 3): at the chairs aug shape this kernel
measures 48.5 ms vs 57.2 ms for the gather path — program-count-bound
(2560 programs) — and was superseded as the default by the dense two-pass
LU resampler (``ops/affine2pass.py``, ~14 ms); it remains available via
``MFN_AUG_SAMPLER=pallas`` and handles *arbitrary* smooth sampling maps,
not just affine ones (benchmarks/affine_kernel_ab.py).

Approach (MXU as the sampler):
  * The source image lives VMEM-resident per batch element in (H, C, W)
    layout (block index constant across spatial tiles).
  * The output is processed in (T, U) tiles. For sampling maps whose
    coordinates vary smoothly over the output tile (affine augmentation
    grids), each tile only reads a bounded source window; the wrapper
    computes per-tile window origins (8-aligned rows / 128-aligned lanes,
    handed to the kernel through SMEM) and the caller supplies a static
    window size derived from the transform parameter ranges.
  * Row interpolation is a one-hot matmul: ``wy[u, h] = relu(1 - |sy_u - h|)``
    contracted against the window rows on the MXU. Column interpolation is a
    VPU weighted reduction over the window lanes. Zero-padding semantics are
    exact: weights vanish outside [0, dim-1] (matches ops/warp.py 'gather').
  * bf16 weights/values would inject ~0.4% relative error -- fine for
    images, not for flow labels or the mask renormalization. The last
    ``precise_ch`` channels are therefore sampled with a hi/lo split of both
    values and weights (three extra bf16 matmul terms), keeping the label
    error below ~1e-5 relative while all matmuls stay on the fast bf16 path.

Forward-only by design: augmentation runs outside the loss gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _split_hi_lo(v: Array):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(oy_ref, ox_ref, img_ref, sy_ref, sx_ref, out_ref, *,
            wy_win: int, wx_win: int, n_ch: int, precise_ch: int,
            t_rows: int, u_cols: int, h: int, wp: int):
    """img_ref: (1, H, C2, Wp) bf16 where C2 = n_ch + precise_ch (the last
    precise_ch source channels appear twice: hi at [n_ch-precise_ch:n_ch],
    lo at [n_ch:]). out_ref: (1, 1, 1, T, U, n_ch) f32."""
    oy = pl.multiple_of(
        oy_ref[pl.program_id(0), pl.program_id(1), pl.program_id(2)], 8)
    ox = pl.multiple_of(
        ox_ref[pl.program_id(0), pl.program_id(1), pl.program_id(2)], 128)
    win = img_ref[0, pl.ds(oy, wy_win), :, pl.ds(ox, wx_win)]
    win2 = win.reshape(wy_win, (n_ch + precise_ch) * wx_win)  # lane merge

    pc = precise_ch
    nc = n_ch
    p = t_rows * u_cols

    # weights built in (T, U, WIN) 3-D then merged on the LEADING dims
    # (layout-free); a (T, U) -> (P,) lane-merge is not Mosaic-supported
    hh = (oy + jax.lax.broadcasted_iota(
        jnp.int32, (t_rows, u_cols, wy_win), 2)).astype(jnp.float32)
    ww = (ox + jax.lax.broadcasted_iota(
        jnp.int32, (t_rows, u_cols, wx_win), 2)).astype(jnp.float32)
    syt = sy_ref[0, 0, 0]                                # (T, U)
    sxt = sx_ref[0, 0, 0]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(syt[:, :, None] - hh)
                     ).reshape(p, wy_win)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sxt[:, :, None] - ww)
                     ).reshape(p, wx_win)
    wy_hi, wy_lo = _split_hi_lo(wy)

    rows = jax.lax.dot_general(                  # (P, WY) @ (WY, C2*WX)
        wy_hi, win2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(p, nc + pc, wx_win)
    out = jnp.sum(rows[:, :nc] * wx[:, None, :], axis=2)     # (P, nc)

    if pc:
        # precise channels get two extra terms: Wy_hi @ v_lo (in rows[:,nc:])
        # and Wy_lo @ v_hi; routed into the last pc output channels by a
        # static 0/1 projection (concat/pad are not Mosaic-friendly).
        win_p = win[:, nc - pc:nc].reshape(wy_win, pc * wx_win)
        rows_lo = jax.lax.dot_general(
            wy_lo, win_p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(p, pc, wx_win)
        corr = jnp.sum((rows[:, nc:] + rows_lo) * wx[:, None, :], axis=2)
        proj = jax.lax.broadcasted_iota(jnp.int32, (pc, nc), 0) \
            == jax.lax.broadcasted_iota(jnp.int32, (pc, nc), 1) - (nc - pc)
        out = out + jax.lax.dot_general(
            corr, proj.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out_ref[0, 0, 0] = out.reshape(t_rows, u_cols, nc)


def _window_origins(s: Array, tiles: tuple[int, int], win: int, size: int,
                    align: int) -> Array:
    """Per-tile aligned window start for coord array s (N, Ho, Wo)."""
    n, ho, wo = s.shape
    nty, ntx = ho // tiles[0], wo // tiles[1]
    st = s.reshape(n, nty, tiles[0], ntx, tiles[1])
    lo = jnp.floor(jnp.min(st, axis=(2, 4))) - 1.0          # (N, nty, ntx)
    lo = jnp.clip(lo, 0.0, float(max(size - win, 0)))
    lo = (lo.astype(jnp.int32) // align) * align
    return lo


def windowed_sample(img: Array, sy: Array, sx: Array, *,
                    window: tuple[int, int], tile: tuple[int, int] = (8, 56),
                    precise_ch: int = 0, interpret: bool = False) -> Array:
    """Bilinear-sample ``img`` (N,H,W,C) at absolute coords (sy, sx), each
    (N,Ho,Wo), zero padding outside. ``window`` = (wy, wx) is a static bound
    on the source extent any (tile) output tile touches: wy >= max|dsy| over
    the tile + 3, similarly wx (caller derives it from its transform ranges;
    see augment/geometry.py). Coordinates escaping the window would read
    zeros -- callers must pass a sound bound. The last ``precise_ch``
    channels get ~f32-accurate sampling (see module docstring); the rest are
    sampled in bf16.
    """
    n, h, w, c = img.shape
    _, ho, wo = sy.shape
    t_rows, u_cols = tile
    assert ho % t_rows == 0 and wo % u_cols == 0, (sy.shape, tile)
    nty, ntx = ho // t_rows, wo // u_cols

    wp = -(-w // 128) * 128
    wy_win = min(-(-(window[0] + 9) // 8) * 8, -(-h // 8) * 8)
    wx_win = min(-(-window[1] // 128) * 128 + 128, wp)

    imgt = jnp.transpose(img, (0, 1, 3, 2))                 # (N, H, C, W)
    if wp != w:
        imgt = jnp.pad(imgt, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    hi, lo_all = _split_hi_lo(imgt.astype(jnp.float32))
    parts = [hi]
    if precise_ch:
        parts.append(lo_all[:, :, c - precise_ch:])
    imgk = jnp.concatenate(parts, axis=2) if precise_ch else hi

    hp = -(-h // 8) * 8
    if hp != h:
        imgk = jnp.pad(imgk, ((0, 0), (0, hp - h), (0, 0), (0, 0)))

    sy = sy.astype(jnp.float32)
    sx = sx.astype(jnp.float32)
    oy = _window_origins(sy, tile, wy_win, hp, 8)
    ox = _window_origins(sx, tile, wx_win, wp, 128)
    # tile dims last so every block satisfies the (8,128)-or-full rule
    sy5 = sy.reshape(n, nty, t_rows, ntx, u_cols).transpose(0, 1, 3, 2, 4)
    sx5 = sx.reshape(n, nty, t_rows, ntx, u_cols).transpose(0, 1, 3, 2, 4)

    def call(args):
        oy_, ox_, imgk_, sy_, sx_ = args
        nb = imgk_.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, nty, ntx),
            in_specs=[
                pl.BlockSpec((1, hp, c + precise_ch, wp),
                             lambda b, ty, tx, oy, ox: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, t_rows, u_cols),
                             lambda b, ty, tx, oy, ox: (b, ty, tx, 0, 0)),
                pl.BlockSpec((1, 1, 1, t_rows, u_cols),
                             lambda b, ty, tx, oy, ox: (b, ty, tx, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, t_rows, u_cols, c),
                lambda b, ty, tx, oy, ox: (b, ty, tx, 0, 0, 0)),
        )
        return pl.pallas_call(
            functools.partial(_kernel, wy_win=wy_win, wx_win=wx_win, n_ch=c,
                              precise_ch=precise_ch, t_rows=t_rows,
                              u_cols=u_cols, h=hp, wp=wp),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, nty, ntx, t_rows, u_cols, c),
                                           jnp.float32),
            interpret=interpret,
        )(oy_, ox_, imgk_, sy_, sx_)

    # This PJRT backend stages whole pallas_call operands/results in VMEM
    # (16 MB scoped limit), so process the batch in chunks sized to fit.
    per_n = (imgk.nbytes + sy5.nbytes + sx5.nbytes
             + nty * ntx * t_rows * u_cols * c * 4) // max(n, 1)
    chunk = n
    while chunk > 1 and (chunk * per_n > 8 * 2 ** 20 or n % chunk):
        chunk -= 1
    args = (oy, ox, imgk, sy5, sx5)
    if chunk == n:
        out = call(args)
    else:
        args = jax.tree_util.tree_map(
            lambda a: a.reshape((n // chunk, chunk) + a.shape[1:]), args)
        out = jax.lax.map(call, args)
        out = out.reshape((n,) + out.shape[2:])
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(n, ho, wo, c)
