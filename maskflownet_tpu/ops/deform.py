"""Flow-guided deformable 3x3 convolution (NHWC).

Semantic contract (replicates MXNet ``F.contrib.DeformableConvolution`` as the
reference uses it -- ``network/layer.py:117-121`` invoked with offsets that
are the *same* flow vector replicated over all 9 taps,
``network/MaskFlownet.py:230,248,266,284`` and cascade ``:465-525``):

  ``out[n, y, x, o] = bias[o] + sum_{ky,kx in {-1,0,1}} sum_c
        w[ky+1, kx+1, c, o] *
        bilinear(x_in, y + dy(n,y,x) + ky, x + dx(n,y,x) + kx)[c]``

i.e. a 3x3 convolution whose sampling window is rigidly shifted per output
pixel by the flow (dy, dx). Out-of-bounds bilinear corners contribute zero
(MXNet ``deformable_im2col`` semantics). Note this is *not* warp-then-conv:
all 9 taps use the offset of the window center.

Implementation: all 9 taps share one fractional offset per pixel, so their
36 bilinear corners collapse onto a 4x4 integer window around
``floor(p + flow)``: 16 shared gathers (instead of 9 independent 4-corner
warps), 9 bilinear recombinations, then one channel contraction as a single
MXU matmul over 9*Cin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maskflownet_tpu import nn
from maskflownet_tpu.ops.warp import _gather_nhwc, unfold_patches

Array = jax.Array


def _unfold_deform(x: Array, flow: Array, weight: Array,
                   bias: Array | None) -> Array:
    """One wide patch-gather per pixel (see ``ops.warp.unfold_patches``).

    All 9 taps share one fractional offset, so their 36 bilinear corners
    collapse onto the 4x4 integer window at ``floor(p + flow) - 1``: a single
    unfolded 16C-slice gather, a separable 4x3 + 3x3 lerp cascade to the 9
    taps, then one MXU matmul over 9*Cin. Fastest path on this TPU backend
    (descriptor-bound gathers; benchmarks/deform_ab.py).
    """
    n, h, w, cin = x.shape
    dtype = x.dtype
    gy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    sy = gy + flow[..., 0].astype(jnp.float32)
    sx = gx + flow[..., 1].astype(jnp.float32)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None].astype(dtype)
    fx = (sx - x0)[..., None].astype(dtype)
    p = unfold_patches(x, y0.astype(jnp.int32) - 1,
                       x0.astype(jnp.int32) - 1, 4)    # (N,H,W,4,4,C)
    # separable bilinear to the 3x3 rigidly-shifted taps
    colq = [[p[..., u, b, :] * (1 - fx) + p[..., u, b + 1, :] * fx
             for b in range(3)] for u in range(4)]
    taps = [(1 - fy) * colq[a][b] + fy * colq[a + 1][b]
            for a in range(3) for b in range(3)]       # (ky, kx) major
    stacked = jnp.concatenate(taps, axis=-1)           # (N,H,W,9*Cin)
    wmat = weight.astype(dtype).reshape(9 * cin, -1)
    out = jax.lax.dot_general(
        stacked.reshape(-1, 9 * cin), wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    ).reshape(n, h, w, -1)
    if bias is not None:
        out = out + bias
    return out


def _warpconv_deform(x: Array, flow: Array, weight: Array,
                     bias: Array | None) -> Array:
    """Conv-then-warp: the algebraically minimal formulation.

    Because all 9 taps share the SAME per-pixel offset (the reference always
    feeds ``F.repeat(flow, 9)``, ``network/MaskFlownet.py:230`` et al.), the
    bilinear weights commute with the tap sum:

      ``sum_k w_k . bilin(I)(p+f+k)  ==  bilin(C)(p+f)``
      with ``C(q) = sum_k w_k I(q+k)``  (cross-correlation form, no flip),

    since ``bilin(C)(p+f) = sum_corners beta_c C(q_c) = sum_k w_k
    sum_corners beta_c I(q_c+k)`` -- the corner set and fractional weights
    depend only on ``frac(p+f)``, not on k. Zero out-of-bounds taps are
    preserved exactly by computing C on a one-pixel-EXTENDED grid
    (coordinates [-1, H] x [-1, W]): a corner at extended coordinate -1
    legitimately reads boundary pixels through its ky=+1 tap, while corners
    at <=-2 have every tap out of bounds -- which is exactly the zero-padded
    extended C.

    So the heavy lifting is one dense 3x3 XLA conv (pure MXU, fused by the
    compiler) and one 2x2-window bilinear gather of the conv output --
    versus 'unfold''s 4x4-window gather + 21-lerp cascade + 9*Cin matmul.
    Same FLOPs in the contraction, ~4x less gather traffic, and the
    backward pass is a conv-transpose instead of patch scatters.
    """
    from maskflownet_tpu.ops.warp import backwarp_coords
    n, h, w, cin = x.shape
    dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    conv = jax.lax.conv_general_dilated(
        xp, weight.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)              # (N, H+2, W+2, Cout)
    gy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    # +1: extended-grid index q' = image coordinate q + 1
    sy = gy + 1.0 + flow[..., 0].astype(jnp.float32)
    sx = gx + 1.0 + flow[..., 1].astype(jnp.float32)
    out = backwarp_coords(conv, sy, sx)
    if bias is not None:
        out = out + bias
    return out


def _onehot_deform(x: Array, flow: Array, weight: Array,
                   bias: Array | None, row_tile: int = 16) -> Array:
    """MXU formulation of the flow-guided deform conv (see
    ``ops/warp.py::_onehot_sample`` for the principle).

    All 9 taps share one fractional offset, and a tap's row-interpolation
    weights are the center tap's shifted by ky — so stage 1 is THREE one-hot
    matmuls of the same weight matrix against y-shifted (zero-padded) copies
    of the feature map; stage 2 selects/blends columns per tap on the VPU;
    stage 3 is the usual (P, 9*Cin) @ (9*Cin, Cout) channel contraction.
    No gathers anywhere, and the autodiff transpose is matmuls (no scatter).
    """
    n, h, w, cin = x.shape
    dtype = x.dtype
    gy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    sy = gy + flow[..., 0].astype(jnp.float32)
    sx = gx + flow[..., 1].astype(jnp.float32)

    # Row/col support must extend one step past the image on each side: a
    # tap at ky=-1 sampling coordinate H-1 reads weight index h=H (center
    # coordinate sy=H), so the one-hot axis covers [-1, H] / [-1, W].
    # y-shifted, W-padded copies for the three tap rows.
    xpad = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    x_k = jnp.stack([
        xpad[:, 1 + ky:1 + ky + h + 2].reshape(n, h + 2, (w + 4) * cin)
        for ky in (-1, 0, 1)])  # (3, N, H+2, (W+4)*Cin)

    hh = jnp.arange(h + 2, dtype=jnp.float32) - 1.0
    ww = jnp.arange(w + 2, dtype=jnp.float32) - 1.0
    rt = min(row_tile, h)
    pad = (-h) % rt
    if pad:
        sy = jnp.pad(sy, ((0, 0), (0, pad), (0, 0)), constant_values=-3.0)
        sx = jnp.pad(sx, ((0, 0), (0, pad), (0, 0)), constant_values=-3.0)
    nt = (h + pad) // rt
    sy_t = sy.reshape(n, nt, rt * w).transpose(1, 0, 2)
    sx_t = sx.reshape(n, nt, rt * w).transpose(1, 0, 2)
    wmat = weight.reshape(9 * cin, -1)

    def tile(_, t):
        syt, sxt = t  # (N, P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(syt[..., None] - hh)).astype(dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sxt[..., None] - ww)).astype(dtype)
        taps = []
        for ky in (-1, 0, 1):
            rows = jax.lax.dot_general(  # (N,P,H+2) @ (N,H+2,(W+4)C)
                wy, x_k[ky + 1], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype)
            rows = rows.reshape(rows.shape[0], rows.shape[1], w + 4, cin)
            for kx in (-1, 0, 1):
                # wx spans ww in [-1, W]; col j of rows is img col j-2+kx
                taps.append(jnp.einsum(
                    "npw,npwc->npc", wx, rows[:, :, kx + 1:kx + 1 + w + 2]))
        stacked = jnp.concatenate(taps, axis=-1)  # (N, P, 9*Cin) tap-major
        out = jax.lax.dot_general(
            stacked, wmat, (((2,), (0,)), ((), ())),
            preferred_element_type=dtype)
        return None, out

    _, outs = jax.lax.scan(tile, None, (sy_t, sx_t))  # (nt, N, P, Cout)
    out = outs.transpose(1, 0, 2, 3).reshape(n, nt * rt, w, -1)
    if pad:
        out = out[:, :h]
    if bias is not None:
        out = out + bias
    return out


def flow_guided_deform_conv3x3(x: Array, flow: Array, weight: Array,
                               bias: Array | None = None,
                               method: str = "auto") -> Array:
    """x: (N,H,W,Cin); flow: (N,H,W,2) (dy,dx) pixels at this level;
    weight: (3,3,Cin,Cout); bias: (Cout,) or None. -> (N,H,W,Cout).

    ``method``: 'gather' (16 shared corner gathers; best off-TPU), 'onehot'
    (MXU matmul formulation), 'warpconv' (conv-then-warp identity; TPU
    default), 'unfold', 'pallas', or 'auto'.

    These rigid-window semantics are *exactly* the reference's: the offsets
    it feeds (``F.repeat(F.expand_dims(flow, 1), 9, 1).reshape((0,-3,-2))``,
    ``MaskFlownet.py:230`` et al.) tile the (dy, dx) pair per tap in MXNet's
    interleaved per-tap (y, x) channel layout — proven numerically against
    the deformable_im2col oracle in tests/test_parity_oracle.py. (An earlier
    round shipped a ``strict_offset_compat`` mode built on a misreading that
    dropped the expand_dims/reshape pair; it was removed once the oracle
    settled the question.)
    """
    if method == "auto":
        import os
        # Measured on v5e (benchmarks/deform_ab.py, b8 chairs-stage level
        # shapes, fwd / fwd+bwd ms): 'warpconv' (conv-then-warp via the
        # replicated-offset identity) wins every level -- L2 1.56/1.60 vs
        # 'unfold' 2.30/2.68, L3 1.04/1.07 vs 1.59/1.89, ties at the 5x7
        # L6 site. 'unfold' in turn beats 'gather' (16 corner gathers) ~5x
        # at L2, and all beat 'onehot' / the fused Pallas one-hot kernel
        # (MXU time wasted on the dense interpolation matrix).
        # MFN_DEFORM overrides for A/B experiments.
        default = "warpconv" if jax.default_backend() == "tpu" else "gather"
        method = os.environ.get("MFN_DEFORM", default)
    if method == "warpconv":
        return _warpconv_deform(x, flow, weight, bias)
    if method == "unfold":
        return _unfold_deform(x, flow, weight, bias)
    if method == "pallas":
        from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas
        out = deform_conv3x3_pallas(x, flow, weight)
        return out + bias if bias is not None else out
    if method == "onehot":
        return _onehot_deform(x, flow, weight, bias)
    n, h, w, cin = x.shape
    dtype = x.dtype
    gy = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (1, h, w), 2)
    sy = gy + flow[..., 0].astype(jnp.float32)
    sx = gx + flow[..., 1].astype(jnp.float32)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None].astype(dtype)
    fx = (sx - x0)[..., None].astype(dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # 16 shared corner gathers on the 4x4 window (u, v in -1..2)
    corners = {}
    for u in (-1, 0, 1, 2):
        for v in (-1, 0, 1, 2):
            yy = y0i + u
            xx = x0i + v
            valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
            g = _gather_nhwc(x, jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1))
            corners[(u, v)] = jnp.where(valid, g, jnp.zeros((), dtype))

    # 9 taps: bilinear recombination with the shared fractional weights
    taps = []
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            taps.append((1 - fy) * (1 - fx) * corners[(ky, kx)]
                        + (1 - fy) * fx * corners[(ky, kx + 1)]
                        + fy * (1 - fx) * corners[(ky + 1, kx)]
                        + fy * fx * corners[(ky + 1, kx + 1)])
    stacked = jnp.concatenate(taps, axis=-1)  # (N,H,W,9*Cin), tap-major
    wmat = weight.reshape(9 * cin, -1)
    out = jax.lax.dot_general(
        stacked.reshape(-1, 9 * cin), wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    ).reshape(n, h, w, -1)
    if bias is not None:
        out = out + bias
    return out


def deform_conv(ctx: "nn.Ctx", name: str, x: Array, flow: Array, cout: int,
                *, use_bias: bool = True) -> Array:
    """Parameterized wrapper (the framework's ``DeformableConv2D`` equivalent,
    cf. reference ``network/layer.py:32-124``; always kernel 3, stride 1,
    pad 1, one deformable group)."""
    cin = x.shape[-1]
    wgt = ctx.param(f"{name}/w", (3, 3, cin, cout), nn.msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), nn.zeros_init) if use_bias else None
    return flow_guided_deform_conv3x3(x, flow, wgt, b)
