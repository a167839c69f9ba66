"""Fused Pallas TPU kernel for the flow-guided deformable 3x3 convolution.

Semantics identical to ``ops.deform.flow_guided_deform_conv3x3`` (the
reference's ``F.contrib.DeformableConvolution`` with all 9 tap offsets equal
to the flow, ``network/MaskFlownet.py:230`` et al.): all taps of the 3x3
window are rigidly shifted per output pixel by (dy, dx), out-of-bounds
bilinear corners contribute zero.

Why a kernel: per-pixel gathers serialize on TPU and their autodiff transpose
is a scatter-add (worse). The bilinear kernel ``max(0, 1 - |s - i|)`` is a
one-hot matrix with the two interpolation weights as its nonzeros, so row
interpolation is a dense (P, H+2) x (H+2, Cin*Wp) MXU matmul. Doing that in
XLA round-trips the (P, Cin*Wp) row intermediate through HBM (~0.5 GB per
level-2 pass); here it stays in VMEM.

Layout: the padded source image lives VMEM-resident per batch element as
(H+4, Cin*Wp) with Wp = (W+4) rounded up to a lane multiple of 128 --
channel-major so the stage-1 matmul output splits into (P, Cin, Wp) as a
pure lane regrouping (Mosaic rejects lane splits whose trailing dim is not
128-divisible). The Wp-pad columns hold zeros, so column weights there can
be nonzero without affecting results (zero values x any weight = 0, matching
the zero out-of-bounds contract).

Stages per (batch, row-tile) program:
  1. MXU: for tap row ky, ``rows = wy @ xpad[1+ky : 1+ky+H+2]`` -- the 9
     taps share one fractional offset, so tap (ky, kx) is the center pixel's
     one-hot row weights against a shifted image slice.
  2. VPU: column interpolation ``tap = sum_m rows[p,c,m] * wx_kx[p,m]``
     where ``wx_kx[p,m] = relu(1 - |sx_p + kx + 2 - m|)`` is built directly
     against absolute lane positions (no slicing).
  3. MXU: channel contraction ``acc += tap @ w[ky,kx]``, f32 accumulators.
Backward: one kernel recomputes wy/wx/rows (no residuals beyond the inputs)
and emits dx / dflow / dweight as matmuls -- no scatter anywhere. The
one-hot derivative is ``-sign(s - i)`` on the open support (VPU).

Gradient support via ``jax.custom_vjp`` (pallas_call is not differentiable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_ROW_BYTES_FWD = 2 * 1024 * 1024
_ROW_BYTES_BWD = 1 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pick_rt(h: int, w: int, cin: int, wp: int, budget: int) -> int:
    """Largest divisor of h whose (rt*w, cin*wp) row intermediate fits."""
    best = 1
    for rt in range(1, h + 1):
        if h % rt == 0 and rt * w * cin * wp * 2 <= budget:
            best = rt
    return best


def _fiota(shape, dim):
    # Mosaic's tpu.iota is integer-only; build int32 and cast.
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _row_onehot(syb, h: int, w: int, dtype):
    """wy[p, i] = relu(1 - |sy_p - (i-1)|), i in [0, H+2) covering image rows
    [-1, H] (a tap at ky=+-1 reads one row past the image)."""
    rt = syb.shape[0]
    ii = _fiota((rt, w, h + 2), 2) - 1.0
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(syb[..., None] - ii))
    return wy.astype(dtype).reshape(rt * w, h + 2)


def _col_weights(sxb, kx: int, wp: int, dtype):
    """wx_kx[p, m] = relu(1 - |sx_p + kx + 2 - m|) over xpad columns m
    (image column m-2); tap kx samples image coordinate sx + kx."""
    rt, w = sxb.shape
    mf = _fiota((rt, w, wp), 2)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sxb[..., None] + (kx + 2.0) - mf))
    return wx.astype(dtype).reshape(rt * w, 1, wp)


def _xpad_cmajor(x: Array, wp: int) -> Array:
    """(N,H,W,Cin) -> (N, H+4, Cin*Wp) zero-padded, channel-major."""
    n, h, w, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xp = xp.transpose(0, 1, 3, 2)                      # (N, H+4, Cin, W+4)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - (w + 4))))
    return xp.reshape(n, h + 4, cin * wp)


def _fwd_kernel(xp_ref, sy_ref, sx_ref, w_ref, out_ref, *,
                h: int, w: int, cin: int, rt: int, wp: int):
    dtype = xp_ref.dtype
    p = rt * w
    wy = _row_onehot(sy_ref[0, 0], h, w, dtype)
    wxs = [_col_weights(sx_ref[0, 0], kx, wp, dtype) for kx in (-1, 0, 1)]
    acc = None
    for ky in (-1, 0, 1):
        xk = xp_ref[0, 1 + ky:1 + ky + h + 2, :]       # (H+2, Cin*Wp)
        rows3 = jax.lax.dot_general(                   # (P, Cin, Wp)
            wy, xk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype).reshape(
                p, cin, wp)
        for kx in (-1, 0, 1):
            tap = jnp.sum(rows3 * wxs[kx + 1], axis=-1)   # (P, Cin)
            term = jax.lax.dot_general(                   # (P, Cout) f32
                tap, w_ref[(ky + 1) * 3 + kx + 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    out_ref[0, 0] = acc.reshape(rt, w, -1).astype(out_ref.dtype)


def _fwd_call(x: Array, sy: Array, sx: Array, wmat: Array,
              interpret: bool) -> Array:
    n, h, w, cin = x.shape
    cout = wmat.shape[-1]
    wp = _round_up(w + 4, 128)
    rt = _pick_rt(h, w, cin, wp, _ROW_BYTES_FWD)
    nt = h // rt
    xp = _xpad_cmajor(x, wp)
    # (rt, w[, cout]) exposed as full trailing block dims (Mosaic requires
    # the last two block dims be tile-divisible or cover the whole dim).
    sy4 = sy.reshape(n, nt, rt, w)
    sx4 = sx.reshape(n, nt, rt, w)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, cin=cin, rt=rt, wp=wp),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, h + 4, cin * wp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rt, w, cout),
                               lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nt, rt, w, cout), x.dtype),
        interpret=interpret,
    )(xp, sy4, sx4, wmat)
    return out.reshape(n, h, w, cout)


def _bwd_kernel(xp_ref, sy_ref, sx_ref, w_ref, g_ref,
                dxp_ref, dsy_ref, dsx_ref, dw_ref, *,
                h: int, w: int, cin: int, rt: int, wp: int):
    dtype = xp_ref.dtype
    p = rt * w
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dxp_ref[0] = jnp.zeros_like(dxp_ref[0])

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    syb, sxb = sy_ref[0, 0], sx_ref[0, 0]              # (rt, w) f32
    wy = _row_onehot(syb, h, w, dtype)
    wxs = [_col_weights(sxb, kx, wp, dtype) for kx in (-1, 0, 1)]
    g = g_ref[0, 0].reshape(p, -1).astype(dtype)       # (P, Cout)

    mf = _fiota((rt, w, wp), 2)
    dwy = jnp.zeros((p, h + 2), jnp.float32)
    dsx = jnp.zeros((rt, w), jnp.float32)
    for ky in (-1, 0, 1):
        xk = xp_ref[0, 1 + ky:1 + ky + h + 2, :]       # (H+2, Cin*Wp)
        rows3 = jax.lax.dot_general(
            wy, xk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype).reshape(
                p, cin, wp)
        drows3 = None
        for kx in (-1, 0, 1):
            k = (ky + 1) * 3 + kx + 1
            wx1 = wxs[kx + 1]
            tap = jnp.sum(rows3 * wx1, axis=-1)        # (P, Cin)
            # dweight[k] += tap^T @ g
            dw_ref[k] += jax.lax.dot_general(
                tap, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dtap = g @ w[k]^T
            # kept f32: Mosaic supports minor-dim insertion (the [:, :,
            # None] broadcasts below) only for 32-bit types
            dtap = jax.lax.dot_general(
                g, w_ref[k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (P, Cin) f32
            # dsx via d(wx)/dsx = -sign(sx + kx + 2 - m) on the support
            s2 = jnp.sum(dtap[:, :, None] * rows3, axis=1,
                         dtype=jnp.float32)            # (P, Wp)
            d = sxb[..., None] + (kx + 2.0) - mf       # (rt, w, Wp)
            slope = jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)
            dsx = dsx + jnp.sum(s2.reshape(rt, w, wp) * slope, axis=-1)
            # drows accumulation
            dr = dtap[:, :, None] * wx1                # (P, Cin, Wp)
            drows3 = dr if drows3 is None else drows3 + dr
        drows = drows3.reshape(p, cin * wp).astype(dtype)
        # dxp[1+ky : 1+ky+H+2] += wy^T @ drows
        dxp_ref[0, 1 + ky:1 + ky + h + 2, :] += jax.lax.dot_general(
            wy, drows, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dwy += drows @ xk^T (contract the Cin*Wp lanes)
        dwy = dwy + jax.lax.dot_general(
            drows, xk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    ii = _fiota((rt, w, h + 2), 2) - 1.0
    dy = syb[..., None] - ii
    slope_y = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
    dsy_ref[0, 0] = jnp.sum(dwy.reshape(rt, w, h + 2) * slope_y, axis=-1)
    dsx_ref[0, 0] = dsx


def _bwd_call(x: Array, sy: Array, sx: Array, wmat: Array, g: Array,
              interpret: bool):
    n, h, w, cin = x.shape
    cout = wmat.shape[-1]
    wp = _round_up(w + 4, 128)
    rt = _pick_rt(h, w, cin, wp, _ROW_BYTES_BWD)
    nt = h // rt
    xp = _xpad_cmajor(x, wp)
    sy4 = sy.reshape(n, nt, rt, w)
    sx4 = sx.reshape(n, nt, rt, w)
    g5 = g.reshape(n, nt, rt, w, cout)
    dxp, dsy, dsx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, cin=cin, rt=rt, wp=wp),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, h + 4, cin * wp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w, cout), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h + 4, cin * wp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt, w), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h + 4, cin * wp), jnp.float32),
            jax.ShapeDtypeStruct((n, nt, rt, w), jnp.float32),
            jax.ShapeDtypeStruct((n, nt, rt, w), jnp.float32),
            jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        ],
        interpret=interpret,
    )(xp, sy4, sx4, wmat, g5)
    dx = dxp.reshape(n, h + 4, cin, wp)[:, 2:-2, :, 2:w + 2]
    dx = dx.transpose(0, 1, 3, 2)
    return dx, dsy.reshape(n, h, w), dsx.reshape(n, h, w), dw


def _coords(flow: Array):
    n, h, w, _ = flow.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    sy = gy + flow[..., 0].astype(jnp.float32)
    sx = gx + flow[..., 1].astype(jnp.float32)
    return sy, sx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def deform_conv3x3_pallas(x: Array, flow: Array, weight: Array,
                          interpret: bool = False) -> Array:
    """x: (N,H,W,Cin); flow: (N,H,W,2) (dy,dx) pixels; weight: (3,3,Cin,Cout).
    -> (N,H,W,Cout). Bias (if any) is added by the caller."""
    sy, sx = _coords(flow)
    wmat = weight.astype(x.dtype).reshape(9, weight.shape[2], -1)
    return _fwd_call(x, sy, sx, wmat, interpret)


def _vjp_fwd(x, flow, weight, interpret):
    return deform_conv3x3_pallas(x, flow, weight, interpret), (x, flow, weight)


def _vjp_bwd(interpret, res, g):
    x, flow, weight = res
    sy, sx = _coords(flow)
    wmat = weight.astype(x.dtype).reshape(9, weight.shape[2], -1)
    dx, dsy, dsx, dw = _bwd_call(x, sy, sx, wmat, g, interpret)
    dflow = jnp.stack([dsy, dsx], axis=-1).astype(flow.dtype)
    dweight = dw.reshape(weight.shape).astype(weight.dtype)
    return dx.astype(x.dtype), dflow, dweight


deform_conv3x3_pallas.defvjp(_vjp_fwd, _vjp_bwd)
