"""Numpy oracle of the reference MXNet forward pass (NCHW, MXNet semantics).

Purpose: checkpoint-parity proof without the (unavailable) published weights.
This module *transliterates* the reference network — ``/root/reference/
network/MaskFlownet.py:197-315`` (MaskFlownet_S), ``:443-545`` (cascade),
``:6-62`` (Up/Downsample blocks), ``network/layer.py:8-30`` (warp) — into
plain numpy, operating on Gluon-format parameter dicts (structural keys like
``conv1a.0.weight``, NCHW/MXNet weight layouts). It is an *oracle*, so unlike
the framework itself, fidelity to the reference's exact formulation is the
point; tests/test_parity_oracle.py asserts that ``tools.import_mxnet`` →
framework forward reproduces this function.

MXNet operator semantics replicated here:

* ``nn.Conv2D``: cross-correlation, zero padding, bias; LeakyReLU(0.1) after
  (the reference conv factory, ``MaskFlownet.py:166-174``).
* ``nn.Conv2DTranspose``: weight (Cin, Cout, kh, kw); equivalent forward
  conv on the stride-dilated input with the spatially flipped kernel.
* ``F.Correlation`` (kernel 1, pad=md, max_displacement=md, stride 1/1,
  is_multiply): y-major displacement channels, zero padding, channel-mean
  normalization (sumelems = K^2*C with K=1).
* ``Upsample`` block (``MaskFlownet.py:35-62``): edge-pad bottom/right by 1,
  per-channel Deconvolution with the size-(2f-1) triangle kernel, stride f,
  pad f-1, crop the last row/col.
* ``F.GridGenerator(warp)`` + ``F.BilinearSampler`` (``layer.py:8-18``):
  backward warp by flow with zero out-of-bounds corners. The reference flips
  its (dy, dx) flow to MXNet's (x, y) grid order before GridGenerator; the
  normalize/denormalize round-trip is exact, so the oracle samples directly
  at (y+dy, x+dx).
* ``F.contrib.DeformableConvolution`` (kernel 3, pad 1, stride 1, 1 group):
  offset tensor (N, 2*9, H, W) with *per-tap interleaved (y, x)* channels —
  tap k=(i,j) reads (offsets[2k], offsets[2k+1]) as (oy, ox) and samples
  x at (y + i - 1 + oy, x + j - 1 + ox) with zero out-of-bounds corners
  (``deformable_im2col`` semantics). The reference builds offsets as
  ``F.repeat(F.expand_dims(flow, axis=1), 9, axis=1).reshape((0,-3,-2))``
  (``MaskFlownet.py:230`` et al.): (N,2,H,W) -> (N,1,2,H,W) -> (N,9,2,H,W)
  -> (N,18,H,W), i.e. the (dy, dx) *pair* tiled 9 times in tap-major order.
  Every tap therefore receives the clean (dy, dx) offset — the whole window
  is rigidly shifted by the flow. (Round-2 of this project hypothesized an
  interleaving quirk — taps 0-3 getting (dy, dy) etc.; that reading drops
  the expand_dims/reshape pair and is wrong. test_parity_oracle.py settles
  it numerically.)

All computation is float64 for oracle exactness; callers compare against the
framework's float32 forward with a small tolerance.
"""

from __future__ import annotations

import numpy as np

STRIDES = [64, 32, 16, 8, 4]


# ---------------------------------------------------------------------------
# primitive ops (NCHW, float64)
# ---------------------------------------------------------------------------

def leaky(x, slope=0.1):
    return np.where(x >= 0, x, slope * x)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def conv2d(x, w, b=None, stride=1, pad=1, dilation=1):
    """x (N,Cin,H,W); w (Cout,Cin,kh,kw) — MXNet Conv2D (cross-correlation)."""
    kh, kw = w.shape[2:]
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    sh, sw = (kh - 1) * dilation + 1, (kw - 1) * dilation + 1
    win = np.lib.stride_tricks.sliding_window_view(xp, (sh, sw), axis=(2, 3))
    win = win[:, :, ::stride, ::stride, ::dilation, ::dilation]
    out = np.einsum("nchwij,ocij->nohw", win, w, optimize=True)
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def conv2d_transpose(x, w, b=None, stride=2, pad=1):
    """MXNet Conv2DTranspose: w (Cin, Cout, kh, kw)."""
    n, cin, h, wd = x.shape
    kh, kw = w.shape[2:]
    xd = np.zeros((n, cin, (h - 1) * stride + 1, (wd - 1) * stride + 1),
                  x.dtype)
    xd[:, :, ::stride, ::stride] = x
    wf = w[:, :, ::-1, ::-1].transpose(1, 0, 2, 3)  # (Cout, Cin, kh, kw)
    return conv2d(xd, wf, b, stride=1, pad=kh - 1 - pad)


def upsample(x, f):
    """The reference Upsample block (``MaskFlownet.py:35-62``), per channel."""
    if f == 1:
        return x
    n, c, h, w = x.shape
    xx = x.reshape(n * c, 1, h, w)
    xx = np.pad(xx, ((0, 0), (0, 0), (0, 1), (0, 1)), mode="edge")
    kk = 2 * f - 1
    k1 = 1.0 - np.abs((f - 1) - np.arange(kk, dtype=np.float64)) / f
    ker = np.outer(k1, k1).reshape(1, 1, kk, kk)
    y = conv2d_transpose(xx, ker, None, stride=f, pad=f - 1)
    y = y[:, :, :-1, :-1]
    return y.reshape(n, c, h * f, w * f)


def correlation(f1, f2, md):
    """``F.Correlation`` kernel 1 / pad md / max_displacement md / multiply."""
    n, c, h, w = f1.shape
    d = 2 * md + 1
    f2p = np.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    out = np.empty((n, d * d, h, w), f1.dtype)
    for dy in range(d):
        for dx in range(d):
            out[:, dy * d + dx] = (
                f1 * f2p[:, :, dy:dy + h, dx:dx + w]).mean(axis=1)
    return out


def _bilinear_sample_zero(x, sy, sx):
    """Sample x (N,C,H,W) at real coords (sy, sx) (N,Ho,Wo); zero OOB
    corners (BilinearSampler / deformable_im2col semantics)."""
    n, c, h, w = x.shape
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    fy = sy - y0
    fx = sx - x0
    out = np.zeros((n, c) + sy.shape[1:], x.dtype)
    corners = [(y0, x0, (1 - fy) * (1 - fx)), (y0, x0 + 1, (1 - fy) * fx),
               (y0 + 1, x0, fy * (1 - fx)), (y0 + 1, x0 + 1, fy * fx)]
    for yy, xx, wgt in corners:
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = np.clip(yy, 0, h - 1)
        xc = np.clip(xx, 0, w - 1)
        for i in range(n):
            g = x[i][:, yc[i], xc[i]]                   # (C, Ho, Wo)
            out[i] += np.where(valid[i], wgt[i], 0.0)[None] * g
    return out


def bilinear_warp(x, flow):
    """``Reconstruction2D``: backward-warp x by flow ((N,2,H,W), (dy,dx))."""
    n, _, h, w = x.shape
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    sy = gy[None] + flow[:, 0]
    sx = gx[None] + flow[:, 1]
    return _bilinear_sample_zero(x, sy, sx)


def make_offsets(flow):
    """The reference's offset construction (``MaskFlownet.py:230`` et al.):
    expand_dims(axis=1) -> repeat 9 on axis 1 -> reshape((0,-3,-2))."""
    n, _, h, w = flow.shape
    return np.repeat(flow[:, None], 9, axis=1).reshape(n, 18, h, w)


def deformable_conv(x, offsets, w, b=None):
    """``F.contrib.DeformableConvolution`` kernel 3 / stride 1 / pad 1 /
    dilation 1 / 1 deformable group. offsets: (N, 18, H, W), per-tap
    interleaved (y, x)."""
    n, cin, h, wd = x.shape
    cout = w.shape[0]
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(wd, dtype=np.float64), indexing="ij")
    taps = []
    for k in range(9):
        i, j = k // 3, k % 3
        sy = gy[None] + (i - 1) + offsets[:, 2 * k]
        sx = gx[None] + (j - 1) + offsets[:, 2 * k + 1]
        taps.append(_bilinear_sample_zero(x, sy, sx))
    stacked = np.stack(taps, axis=1)                    # (N, 9, Cin, H, W)
    w9 = w.reshape(cout, cin, 9).transpose(0, 2, 1)     # (Cout, 9, Cin)
    out = np.einsum("nkchw,okc->nohw", stacked, w9, optimize=True)
    if b is not None:
        out = out + b[None, :, None, None]
    return out


# ---------------------------------------------------------------------------
# parameterized blocks over a Gluon param dict
# ---------------------------------------------------------------------------

class _P:
    """Gluon param-dict accessor with an optional scope prefix; arrays are
    promoted to float64."""

    def __init__(self, params, prefix=""):
        self.params = params
        self.prefix = prefix

    def __call__(self, key):
        return np.asarray(self.params[self.prefix + key], np.float64)

    def get(self, key):
        v = self.params.get(self.prefix + key)
        return None if v is None else np.asarray(v, np.float64)


def _conv(p, name, x, stride=1, pad=1, dilation=1, act=True):
    """Reference conv factory: Sequential(Conv2D, LeakyReLU?) — child '0'."""
    y = conv2d(x, p(f"{name}.0.weight"), p(f"{name}.0.bias"),
               stride=stride, pad=pad, dilation=dilation)
    return leaky(y) if act else y


def _deconv(p, name, x):
    y = conv2d_transpose(x, p(f"{name}.0.weight"), p(f"{name}.0.bias"),
                         stride=2, pad=1)
    return leaky(y)


def _pred(p, name, x):
    """predict_flow / predict_mask: bare Conv2D (no Sequential child)."""
    return conv2d(x, p(f"{name}.weight"), p(f"{name}.bias"))


def _deform(p, name, x, flow_offsets):
    return deformable_conv(x, flow_offsets, p(f"{name}.weight"),
                           p.get(f"{name}.bias"))


def _pyramid(p, x, names):
    feats = []
    for i in range(1, 7):
        x = _conv(p, f"conv{i}{names[0]}", x, stride=2)
        x = _conv(p, f"conv{i}{names[1]}", x)
        x = _conv(p, f"conv{i}{names[2]}", x)
        feats.append(x)
    return feats


def _dense_block(p, lvl, x):
    for j in range(5):
        x = np.concatenate([_conv(p, f"conv{lvl}_{j}", x), x], axis=1)
    return x


def _context_net(p, x):
    x = _conv(p, "dc_conv1", x, pad=1, dilation=1)
    x = _conv(p, "dc_conv2", x, pad=2, dilation=2)
    x = _conv(p, "dc_conv3", x, pad=4, dilation=4)
    x = _conv(p, "dc_conv4", x, pad=8, dilation=8)
    x = _conv(p, "dc_conv5", x, pad=16, dilation=16)
    x = _conv(p, "dc_conv6", x, pad=1, dilation=1)
    return _pred(p, "dc_conv7", x)


# ---------------------------------------------------------------------------
# model forwards (transliterations of hybrid_forward)
# ---------------------------------------------------------------------------

def maskflownet_s_forward(params, im1, im2, scale=20.0, prefix=""):
    """Reference ``MaskFlownet_S.hybrid_forward`` (``MaskFlownet.py:197-315``).

    im1/im2: (N, 3, H, W) float; returns (predictions, occlusion_masks, srcs)
    with the same structure (predictions are flow * scale, (dy, dx))."""
    p = _P(params, prefix)
    md = 4

    c1s = _pyramid(p, np.asarray(im1, np.float64), "abc")
    c2s = _pyramid(p, np.asarray(im2, np.float64), "abc")
    c11, c12, c13, c14, c15, c16 = c1s
    c21, c22, c23, c24, c25, c26 = c2s

    corr6 = leaky(correlation(c16, c26, md))
    x = _dense_block(p, 6, corr6)
    flow6 = _pred(p, "pred_flow6", x)
    mask6 = _pred(p, "pred_mask6", x)

    flows = [flow6]
    flow, mask = flow6, mask6
    feats = {5: (c15, c25), 4: (c14, c24), 3: (c13, c23), 2: (c12, c22)}
    for idx, lvl in enumerate((5, 4, 3, 2)):
        c1l, c2l = feats[lvl]
        feat = _deconv(p, f"upfeat{lvl}", x)
        flow = upsample(flow, 2)
        mask = upsample(mask, 2)
        offs = make_offsets(flow * scale / STRIDES[idx + 1])
        warp = _deform(p, f"deform{lvl}", c2l, offs)
        warp = warp * sigmoid(mask) + _conv(p, f"conv{lvl}f", feat, act=False)
        warp = leaky(warp)
        corr = leaky(correlation(c1l, warp, md))
        x = np.concatenate([corr, c1l, feat, flow], axis=1)
        x = _dense_block(p, lvl, x)
        flow = flow + _pred(p, f"pred_flow{lvl}", x)
        if lvl > 2:
            mask = _pred(p, f"pred_mask{lvl}", x)
        flows.append(flow)

    flow = flow + _context_net(p, x)
    flows[-1] = flow

    predictions = [f * scale for f in flows]
    occlusion_masks = [sigmoid(mask)]
    c2s_out = [c21, c12, c13, c24, c25, c26]   # the c2s quirk, :306
    mask0 = sigmoid(upsample(mask, 4)) - 0.5
    c30 = np.concatenate([im1, np.zeros_like(mask0)], axis=1)
    c40 = np.concatenate(
        [bilinear_warp(np.asarray(im2, np.float64), upsample(flow, 4) * scale),
         mask0], axis=1)
    srcs = (c1s, c2s_out, flows, c30, c40)
    return predictions, occlusion_masks, srcs


def maskflownet_forward(params, im1, im2, scale=20.0):
    """Reference ``MaskFlownet.hybrid_forward`` (``MaskFlownet.py:443-545``).

    The head runs under the ``MaskFlownet_S.`` key prefix."""
    p = _P(params)
    md = 2
    _, _, srcs = maskflownet_s_forward(params, im1, im2, scale,
                                       prefix="MaskFlownet_S.")
    c1s, c2s, head_flows, c30, c40 = srcs
    c11, c12, c13, c14, c15, c16 = c1s
    c21, c22, c23, c24, c25, c26 = c2s

    c3s = _pyramid(p, c30, "xyz")
    c4s = _pyramid(p, c40, "xyz")

    flow = head_flows[0]
    offs = make_offsets(flow * scale / STRIDES[0])
    warp6u = leaky(_deform(p, "deform6", c26, offs))
    corr6u = leaky(correlation(c16, warp6u, md))
    corr6v = leaky(correlation(c3s[5], c4s[5], md))
    x = np.concatenate([corr6u, corr6v, flow], axis=1)
    x = _dense_block(p, 6, x)
    flow = flow + _pred(p, "pred_flow6", x)
    flows = [flow]

    feats = {5: (c15, c25), 4: (c14, c24), 3: (c13, c23), 2: (c12, c22)}
    for idx, lvl in enumerate((5, 4, 3, 2)):
        c1l, c2l = feats[lvl]
        feat = _deconv(p, f"upfeat{lvl}", x)
        flow = upsample(flow, 2)
        offs = make_offsets(flow * scale / STRIDES[idx + 1])
        warpu = leaky(_deform(p, f"deform{lvl}", c2l, offs))
        corru = leaky(correlation(c1l, warpu, md))
        corrv = leaky(correlation(c3s[lvl - 1], c4s[lvl - 1], md))
        x = np.concatenate([c1l, feat, corru, corrv, flow,
                            head_flows[idx + 1]], axis=1)
        x = _dense_block(p, lvl, x)
        flow = flow + _pred(p, f"pred_flow{lvl}", x)
        flows.append(flow)

    flow = flow + _context_net(p, x)
    flows[-1] = flow

    preds = [f * scale for f in flows]
    visuals = [flow[:, 0:1]]
    return preds, visuals, ()
