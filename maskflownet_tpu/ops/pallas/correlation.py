"""Fused Pallas TPU kernels for the FlowNet-C correlation cost volume.

Semantics identical to ``ops.correlation.correlation_xla`` (see that module's
contract; reference ``network/MaskFlownet.py:193-195``): y-major displacement
channels, zero padding, channel-mean normalization.

Design:
  * f2 (and, in the backward kernels, f1 / the cotangent) is pre-padded by
    ``md`` so displacements become slices -- no VPU shifts.
  * 3-D grids (batch, H-tile, dy) / (batch, dy, H-tile) with D = 2md+1:
    each program computes one H-tile's D dx-channels for one ``dy``. The
    per-program instruction count stays ~D (a fully unrolled D^2 kernel
    takes Mosaic minutes to compile) and VMEM stays small (a fully
    per-batch kernel overflows the 16MB scoped limit with its f32
    temporaries at production shapes). Grid orders are chosen so the large
    padded blocks keep a constant block index on the fastest axis (Pallas
    skips re-copies between consecutive identical block indices).
  * Mosaic requires lane-dim blocks to be full or 128-divisible, so per-dy
    channel groups live in their own *dimension*: kernels produce
    (N, D, H, W, D) and the wrapper transposes to (N, H, W, D^2) (cheap XLA
    transpose). Backward receives the cotangent pre-arranged the same way.
  * Products stay in the input dtype; only the channel reduction accumulates
    in f32 (``jnp.sum(..., dtype=f32)``), on the lane axis.
  * Backward kernels accumulate df1/df2 across the dy grid axis in a
    revisited output block (zero-initialized at dy == 0).
  * ``leaky`` fuses the LeakyReLU that always follows the cost volume in the
    model (reference ``MaskFlownet.py:216-217``) into the kernel epilogue,
    applied to the f32 accumulator before the output cast -- the (N,H,W,81)
    cost volume (the largest activation in the network) is then written to
    HBM exactly once instead of read+written again by a separate
    elementwise op. The backward pre-scales the cotangent by the activation
    derivative using the saved *output* sign (out >= 0 iff pre-activation
    >= 0 since the slope is positive), an elementwise op XLA fuses into the
    cotangent transpose.

Gradient support via ``jax.custom_vjp`` (pallas_call is not differentiable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _h_tile(h: int, cap: int = 16) -> int:
    for t in range(min(cap, h), 0, -1):
        if h % t == 0:
            return t
    return h


def _leaky(v, slope):
    return v if slope is None else jnp.where(v >= 0, v, slope * v)


def _corr_fwd_kernel(f1_ref, f2p_ref, out_ref, *, md: int, n_ch: int,
                     th: int, leaky):
    d = 2 * md + 1
    w = f1_ref.shape[2]
    ht = pl.program_id(1)
    a = f1_ref[0]                                           # (TH, W, C)
    inv_c = 1.0 / n_ch
    outs = []
    for dy in range(d):
        brows = f2p_ref[0, pl.ds(ht * th + dy, th), :, :]   # (TH, W+2md, C)
        for dx in range(d):
            b = brows[:, dx:dx + w, :]
            outs.append(_leaky(
                jnp.sum(a * b, axis=-1, dtype=jnp.float32) * inv_c, leaky))
    out_ref[0] = jnp.stack(outs, axis=-1).astype(out_ref.dtype)


def _corr_fwd_call(f1: Array, f2: Array, md: int, interpret: bool,
                   leaky=None) -> Array:
    n, h, w, c = f1.shape
    d = 2 * md + 1
    th = _h_tile(h)
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    return pl.pallas_call(
        functools.partial(_corr_fwd_kernel, md=md, n_ch=c, th=th,
                          leaky=leaky),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda b, ht: (b, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda b, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, d * d),
                               lambda b, ht: (b, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d * d), f1.dtype),
        interpret=interpret,
    )(f1, f2p)


def _corr_bwd_f1_kernel(g_ref, f2p_ref, out_ref, *, md: int, n_ch: int,
                        th: int):
    """dL/df1[y,x,c] = sum_d g[y,x,d] * f2[y+dy-md, x+dx-md, c] / C;
    accumulated over the dy grid axis into the revisited out block."""
    d = 2 * md + 1
    w = out_ref.shape[2]
    dy = pl.program_id(1)
    ht = pl.program_id(2)

    @pl.when(dy == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    brows = f2p_ref[0, pl.ds(ht * th + dy, th), :, :]
    inv_c = 1.0 / n_ch
    acc = out_ref[0].astype(jnp.float32)
    for dx in range(d):
        g = g_ref[0, 0, :, :, dx][..., None]
        b = brows[:, dx:dx + w, :]
        acc = acc + (g * b).astype(jnp.float32) * inv_c
    out_ref[0] = acc.astype(out_ref.dtype)


def _corr_bwd_f2_kernel(gp_ref, f1p_ref, out_ref, *, md: int, n_ch: int,
                        th: int):
    """dL/df2[y,x,c] = sum_d g[y-(dy-md), x-(dx-md), d] * f1[same, c] / C.
    gp/f1p arrive padded by md; the (dy,dx) summand is the slice starting at
    (2md-dy, 2md-dx). Accumulated over the dy grid axis."""
    d = 2 * md + 1
    w = out_ref.shape[2]
    dy = pl.program_id(1)
    ht = pl.program_id(2)

    @pl.when(dy == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    y0 = ht * th + 2 * md - dy
    grows = gp_ref[0, 0, pl.ds(y0, th), :, :]   # (TH, W+2md, D) for this dy
    arows = f1p_ref[0, pl.ds(y0, th), :, :]     # (TH, W+2md, C)
    inv_c = 1.0 / n_ch
    acc = out_ref[0].astype(jnp.float32)
    for dx in range(d):
        x0 = 2 * md - dx
        g = grows[:, x0:x0 + w, dx][..., None]
        a = arows[:, x0:x0 + w, :]
        acc = acc + (g * a).astype(jnp.float32) * inv_c
    out_ref[0] = acc.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# H-major kernels (the level-2 winner)
#
# The NHWC kernels above put the *channel* count on the TPU lane axis: C=32
# at the dominant level-2 footprint pads 4x to the 128-lane VMEM tiles, and
# assembling the 81 output channels with jnp.stack forces a giant lane
# relayout -- at (80,112,32,md4) Mosaic crashes outright
# (benchmarks/corr_ab.py round-1 failure).
#
# This family transposes to (N, H, C, W) at the XLA boundary instead:
#   * H is the MAJOR (untiled) block axis, so the per-dy row windows are
#     plain dynamic slices with no alignment constraint (Mosaic only
#     requires provable x8 alignment on the tiled second-minor axis);
#   * C rides the sublane axis (32 = 4 exact sublane groups, zero pad
#     waste) and the channel contraction is a cheap sublane reduction --
#     no cross-lane shuffle cascades;
#   * W rides the lane axis (112 -> one 128-lane tile); the dx windows are
#     static lane slices (vector rotates);
#   * each (dy, dx) writes its own (TH, W) tile of the (N, D^2, H, W)
#     output -- no stack relayout. The wrapper transposes back to NHWC.
# VMEM per program at level 2: f1 131KB + whole-H padded f2 721KB + out
# 331KB -- far under the 16MB scoped limit.
# ---------------------------------------------------------------------------


def _h_tile_hm(h: int, cap: int = 32) -> int:
    """H tile for the H-major family: the (N, D^2, H, W) output block puts
    the tile second-to-last, so it must be x8-divisible (or the full H)."""
    # prefer full bf16 sublane tiles (x16) -- sub-tile (th, W) output
    # writes become read-modify-writes and dominate at narrow shapes
    for mod in (16, 8):
        for t in range(min(cap, h), mod - 1, -1):
            if h % t == 0 and t % mod == 0:
                return t
    return h


def _hm_fwd_kernel(f1_ref, f2p_ref, out_ref, *, md: int, n_ch: int, th: int,
                   leaky):
    d = 2 * md + 1
    w = f1_ref.shape[3]
    ht = pl.program_id(1)
    a = f1_ref[0]                                           # (TH, C, W)
    inv_c = 1.0 / n_ch
    for dy in range(d):
        brows = f2p_ref[0, pl.ds(ht * th + dy, th), :, :]   # (TH, C, W+2md)
        for dx in range(d):
            prod = a * brows[:, :, dx:dx + w]
            out_ref[0, dy * d + dx] = _leaky(
                jnp.sum(prod, axis=1, dtype=jnp.float32) * inv_c, leaky
            ).astype(out_ref.dtype)


def _hm_fwd_call(f1c: Array, f2c: Array, md: int, interpret: bool,
                 leaky=None) -> Array:
    """f1c/f2c: (N, H, C, W) -> (N, D^2, H, W)."""
    n, h, c, w = f1c.shape
    d = 2 * md + 1
    th = _h_tile_hm(h)
    f2p = jnp.pad(f2c, ((0, 0), (md, md), (0, 0), (md, md)))
    return pl.pallas_call(
        functools.partial(_hm_fwd_kernel, md=md, n_ch=c, th=th, leaky=leaky),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda b, ht: (b, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, c, w + 2 * md),
                         lambda b, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * d, th, w),
                               lambda b, ht: (b, 0, ht, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d * d, h, w), f1c.dtype),
        interpret=interpret,
    )(f1c, f2p)


def _hm_bwd_f1_kernel(g_ref, f2p_ref, out_ref, *, md: int, n_ch: int,
                      th: int):
    """df1[y,c,x] = 1/C sum_t g[y,t,x] * f2p[y+dy, c, x+dx]. g arrives in
    H-major layout (N, H, D^2, W) so the per-tap read is a rank-preserving
    value slice (Mosaic cannot lower the (TH,W)->(TH,1,W) reshape a
    channel-indexed load would need)."""
    d = 2 * md + 1
    w = out_ref.shape[3]
    ht = pl.program_id(1)
    inv_c = 1.0 / n_ch
    gall = g_ref[0]                                         # (TH, D^2, W)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)         # (TH, C, W)
    for dy in range(d):
        brows = f2p_ref[0, pl.ds(ht * th + dy, th), :, :]
        for dx in range(d):
            t = dy * d + dx
            gs = gall[:, t:t + 1, :]                        # (TH, 1, W)
            acc = acc + (gs * brows[:, :, dx:dx + w]).astype(jnp.float32)
    out_ref[0] = (acc * inv_c).astype(out_ref.dtype)


def _hm_bwd_f2_kernel(gp_ref, f1p_ref, out_ref, *, md: int, n_ch: int,
                      th: int):
    """df2[y,c,x] = 1/C sum_t g[t, y+2md-dy, x+2md-dx] * f1p[y+2md-dy, c,
    x+2md-dx] (gp/f1p padded by md; gp is (N, H+2md, D^2, W+2md))."""
    d = 2 * md + 1
    w = out_ref.shape[3]
    ht = pl.program_id(1)
    inv_c = 1.0 / n_ch
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)         # (TH, C, W)
    for dy in range(d):
        y0 = ht * th + 2 * md - dy
        grows = gp_ref[0, pl.ds(y0, th), :, :]              # (TH, D^2, W+2md)
        arows = f1p_ref[0, pl.ds(y0, th), :, :]             # (TH, C, W+2md)
        for dx in range(d):
            x0 = 2 * md - dx
            t = dy * d + dx
            gs = grows[:, t:t + 1, x0:x0 + w]               # (TH, 1, W)
            acc = acc + (gs * arows[:, :, x0:x0 + w]).astype(jnp.float32)
    out_ref[0] = (acc * inv_c).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def correlation_pallas_cmajor(f1: Array, f2: Array, md: int = 4,
                              interpret: bool = False,
                              leaky: float | None = None) -> Array:
    """NHWC in/out; H-major (N, H, C, W) compute layout. Semantics identical
    to ``correlation_pallas`` / ``correlation_xla``; ``leaky`` fuses a
    LeakyReLU(leaky) epilogue into the kernel."""
    f1c = f1.transpose(0, 1, 3, 2)
    f2c = f2.transpose(0, 1, 3, 2)
    return _hm_fwd_call(f1c, f2c, md, interpret, leaky).transpose(0, 2, 3, 1)


def _cm_fwd(f1, f2, md, interpret, leaky):
    out = correlation_pallas_cmajor(f1, f2, md, interpret, leaky)
    return out, (f1, f2, out if leaky is not None else None)


def _cm_bwd(md, interpret, leaky, res, g):
    f1, f2, out = res
    if leaky is not None:
        g = jnp.where(out >= 0, g, leaky * g)
    n, h, w, c = f1.shape
    d = 2 * md + 1
    th = _h_tile_hm(h)
    ghm = g.transpose(0, 1, 3, 2)                           # (N, H, D^2, W)
    f1c = f1.transpose(0, 1, 3, 2)                          # (N, H, C, W)
    f2c = f2.transpose(0, 1, 3, 2)
    padc = ((0, 0), (md, md), (0, 0), (md, md))

    f2p = jnp.pad(f2c, padc)
    df1 = pl.pallas_call(
        functools.partial(_hm_bwd_f1_kernel, md=md, n_ch=c, th=th),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, d * d, w), lambda b, ht: (b, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, c, w + 2 * md),
                         lambda b, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, c, w), lambda b, ht: (b, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), f1.dtype),
        interpret=interpret,
    )(ghm, f2p)

    # g in H-major layout for the f2 kernel: (N, H+2md, D^2, W+2md)
    gp = jnp.pad(ghm, padc)
    f1p = jnp.pad(f1c, padc)
    df2 = pl.pallas_call(
        functools.partial(_hm_bwd_f2_kernel, md=md, n_ch=c, th=th),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 2 * md, d * d, w + 2 * md),
                         lambda b, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, c, w + 2 * md),
                         lambda b, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, c, w), lambda b, ht: (b, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), f2.dtype),
        interpret=interpret,
    )(gp, f1p)
    return df1.transpose(0, 1, 3, 2), df2.transpose(0, 1, 3, 2)


correlation_pallas_cmajor.defvjp(_cm_fwd, _cm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def correlation_pallas(f1: Array, f2: Array, md: int = 4,
                       interpret: bool = False,
                       leaky: float | None = None) -> Array:
    return _corr_fwd_call(f1, f2, md, interpret, leaky)


def _corr_fwd(f1, f2, md, interpret, leaky):
    out = _corr_fwd_call(f1, f2, md, interpret, leaky)
    return out, (f1, f2, out if leaky is not None else None)


def _corr_bwd(md, interpret, leaky, res, g):
    f1, f2, out = res
    if leaky is not None:
        g = jnp.where(out >= 0, g, leaky * g)
    n, h, w, c = f1.shape
    d = 2 * md + 1
    th = _h_tile(h)
    pad4 = ((0, 0), (md, md), (md, md), (0, 0))

    # cotangent rearranged to (N, D_dy, H, W, D_dx)
    g5 = g.reshape(n, h, w, d, d).transpose(0, 3, 1, 2, 4)

    f2p = jnp.pad(f2, pad4)
    df1 = pl.pallas_call(
        functools.partial(_corr_bwd_f1_kernel, md=md, n_ch=c, th=th),
        grid=(n, d, h // th),
        in_specs=[
            pl.BlockSpec((1, 1, th, w, d),
                         lambda b, dy, ht: (b, dy, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda b, dy, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c),
                               lambda b, dy, ht: (b, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f1.shape, f1.dtype),
        interpret=interpret,
    )(g5, f2p)

    gp5 = jnp.pad(g5, ((0, 0), (0, 0), (md, md), (md, md), (0, 0)))
    f1p = jnp.pad(f1, pad4)
    df2 = pl.pallas_call(
        functools.partial(_corr_bwd_f2_kernel, md=md, n_ch=c, th=th),
        grid=(n, d, h // th),
        in_specs=[
            pl.BlockSpec((1, 1, h + 2 * md, w + 2 * md, d),
                         lambda b, dy, ht: (b, dy, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda b, dy, ht: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c),
                               lambda b, dy, ht: (b, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f2.shape, f2.dtype),
        interpret=interpret,
    )(gp5, f1p)
    return df1, df2


correlation_pallas.defvjp(_corr_fwd, _corr_bwd)
