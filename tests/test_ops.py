"""Unit tests for the op layer against naive numpy oracles.

These encode the semantic contract copied from the reference's MXNet native
ops (SURVEY.md §2.3): correlation, bilinear warp (zero-pad and clamped),
flow-guided deformable conv, triangle up/downsampling, bilinear resize.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu.ops import (backwarp, correlation_xla, downsample,
                                 flow_guided_deform_conv3x3,
                                 grid_sample_normalized, affine_grid,
                                 resize_bilinear, upsample)

rng = np.random.RandomState(0)


# ---------------------------------------------------------------------------
# numpy oracles
# ---------------------------------------------------------------------------

def np_bilinear_sample(img, sy, sx, clamp=False):
    """img (H,W,C); sy/sx scalar float. Zero padding unless clamp."""
    h, w, _ = img.shape
    if clamp:
        sy = min(max(sy, 0.0), h - 1.0)
        sx = min(max(sx, 0.0), w - 1.0)
    y0, x0 = int(np.floor(sy)), int(np.floor(sx))
    ay, ax = sy - y0, sx - x0
    out = np.zeros(img.shape[-1], img.dtype)
    for dy, wy in ((0, 1 - ay), (1, ay)):
        for dx, wx in ((0, 1 - ax), (1, ax)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                out = out + wy * wx * img[yy, xx]
    return out


def np_backwarp(img, flow, clamp=False):
    n, h, w, c = img.shape
    out = np.zeros_like(img)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                out[b, y, x] = np_bilinear_sample(
                    img[b], y + flow[b, y, x, 0], x + flow[b, y, x, 1], clamp)
    return out


def np_correlation(f1, f2, md):
    n, h, w, c = f1.shape
    d = 2 * md + 1
    out = np.zeros((n, h, w, d * d), f1.dtype)
    f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    for dy in range(d):
        for dx in range(d):
            out[..., dy * d + dx] = (
                f1 * f2p[:, dy:dy + h, dx:dx + w]).mean(axis=-1)
    return out


def np_deform(x, flow, weight, bias):
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    out = np.zeros((n, h, w, cout), x.dtype)
    for b in range(n):
        for y in range(h):
            for xx in range(w):
                acc = np.zeros(cout)
                for ky in range(3):
                    for kx in range(3):
                        v = np_bilinear_sample(
                            x[b], y + flow[b, y, xx, 0] + ky - 1,
                            xx + flow[b, y, xx, 1] + kx - 1)
                        acc += v @ weight[ky, kx]
                out[b, y, xx] = acc + bias
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("clamp", [False, True])
def test_backwarp_matches_oracle(clamp):
    img = rng.randn(2, 7, 9, 3).astype(np.float32)
    flow = (rng.randn(2, 7, 9, 2) * 3).astype(np.float32)
    got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow), clamp=clamp))
    want = np_backwarp(img, flow, clamp=clamp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_backwarp_identity():
    img = rng.randn(1, 5, 6, 2).astype(np.float32)
    flow = np.zeros((1, 5, 6, 2), np.float32)
    got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, img, rtol=1e-6)


def test_backwarp_integer_shift():
    """flow (dy,dx)=(0,1) samples img[x+1]: output col j = input col j+1."""
    img = rng.randn(1, 4, 5, 1).astype(np.float32)
    flow = np.zeros((1, 4, 5, 2), np.float32)
    flow[..., 1] = 1.0
    got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got[:, :, :-1], img[:, :, 1:], rtol=1e-6)
    np.testing.assert_allclose(got[:, :, -1], 0.0, atol=1e-6)


@pytest.mark.parametrize("md", [1, 2, 4])
def test_correlation_matches_oracle(md):
    f1 = rng.randn(2, 6, 8, 5).astype(np.float32)
    f2 = rng.randn(2, 6, 8, 5).astype(np.float32)
    got = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), md))
    want = np_correlation(f1, f2, md)
    assert got.shape == (2, 6, 8, (2 * md + 1) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_correlation_zero_displacement_channel():
    """Center channel equals the plain channel-mean dot product."""
    f1 = rng.randn(1, 4, 4, 8).astype(np.float32)
    f2 = rng.randn(1, 4, 4, 8).astype(np.float32)
    md = 2
    got = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), md))
    center = (2 * md + 1) * md + md
    np.testing.assert_allclose(
        got[..., center], (f1 * f2).mean(-1), rtol=1e-5, atol=1e-6)


def test_deform_conv_matches_oracle():
    x = rng.randn(1, 5, 6, 4).astype(np.float32)
    flow = (rng.randn(1, 5, 6, 2) * 2).astype(np.float32)
    wgt = rng.randn(3, 3, 4, 5).astype(np.float32) * 0.2
    b = rng.randn(5).astype(np.float32)
    got = np.asarray(flow_guided_deform_conv3x3(
        jnp.asarray(x), jnp.asarray(flow), jnp.asarray(wgt), jnp.asarray(b)))
    want = np_deform(x, flow, wgt, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_flow_is_conv3x3():
    """With zero flow, deform conv == standard 3x3 conv (zero padded)."""
    x = rng.randn(1, 6, 6, 3).astype(np.float32)
    wgt = rng.randn(3, 3, 3, 4).astype(np.float32)
    got = np.asarray(flow_guided_deform_conv3x3(
        jnp.asarray(x), jnp.zeros((1, 6, 6, 2)), jnp.asarray(wgt), None))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wgt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("f", [2, 4])
def test_upsample_semantics(f):
    """out[f*i] == x[i]; interior points linearly interpolated; edge clamped."""
    x = rng.randn(2, 3, 4, 2).astype(np.float32)
    y = np.asarray(upsample(jnp.asarray(x), f))
    assert y.shape == (2, 3 * f, 4 * f, 2)
    np.testing.assert_allclose(y[:, ::f, ::f], x, rtol=1e-6)
    # midpoint along W between cols 0 and 1 (at f*0 + f/2):
    np.testing.assert_allclose(
        y[:, 0, f // 2], (x[:, 0, 0] + x[:, 0, 1]) / 2, rtol=1e-5)
    # last rows edge-clamped
    np.testing.assert_allclose(y[:, -1, ::f], x[:, -1, :], rtol=1e-6)


def test_upsample_matches_reference_deconv_form():
    """Cross-check the lerp form against an explicit triangle-kernel
    transposed convolution (the literal reference formulation,
    MaskFlownet.py:35-62)."""
    f = 4
    x = rng.randn(1, 5, 6, 1).astype(np.float32)
    got = np.asarray(upsample(jnp.asarray(x), f))
    # explicit: edge-pad bottom/right, dilated conv with triangle kernel
    k1 = 1 - np.abs((f * 2 - 1) // 2 - np.arange(f * 2 - 1)) / f
    k2 = (k1[:, None] * k1[None, :]).astype(np.float32)[:, :, None, None]
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        jnp.asarray(xp), jnp.asarray(k2), (1, 1),
        [(f - 1, f - 1), (f - 1, f - 1)], lhs_dilation=(f, f),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = np.asarray(y)[:, :-1, :-1]
    np.testing.assert_allclose(got, y, rtol=1e-5, atol=1e-5)


def test_downsample_constant_preserved():
    x = np.full((1, 8, 8, 3), 2.5, np.float32)
    y = np.asarray(downsample(jnp.asarray(x), 2))
    assert y.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(y, 2.5, rtol=1e-5)


def test_downsample_matches_reference_conv_form():
    f = 2
    x = rng.randn(1, 8, 10, 2).astype(np.float32)
    got = np.asarray(downsample(jnp.asarray(x), f))
    w = f // 2
    k1 = ((w + 1) - np.abs(w - np.arange(2 * w + 1))) / (2 * w + 1)
    k2 = (k1[:, None] * k1[None, :]).astype(np.float32)[:, :, None, None]
    args = dict(window_strides=(f, f), padding=[(w, w), (w, w)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want_num = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 3, 1, 2).reshape(2, 8, 10, 1)),
        jnp.asarray(k2), **args)
    want_den = jax.lax.conv_general_dilated(
        jnp.ones((2, 8, 10, 1)), jnp.asarray(k2), **args)
    want = np.asarray(want_num / want_den).reshape(1, 2, 4, 5).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_bilinear_align_corners():
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1)
    y = np.asarray(resize_bilinear(jnp.asarray(x), 1, 7))
    np.testing.assert_allclose(y[0, 0, :, 0], np.linspace(0, 3, 7), rtol=1e-5)
    # corners exactly preserved
    x2 = rng.randn(1, 5, 6, 2).astype(np.float32)
    y2 = np.asarray(resize_bilinear(jnp.asarray(x2), 11, 9))
    np.testing.assert_allclose(y2[0, 0, 0], x2[0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(y2[0, -1, -1], x2[0, -1, -1], rtol=1e-5)


def test_affine_grid_identity():
    """theta=[1,0,0,0,1,0] is the identity map; sampling reproduces img."""
    img = rng.randn(1, 5, 7, 2).astype(np.float32)
    theta = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    gx, gy = affine_grid(theta, 5, 7)
    out = np.asarray(grid_sample_normalized(jnp.asarray(img), gx, gy))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_backwarp_grad_flows():
    """Gradients flow through both image and flow arguments."""
    img = jnp.asarray(rng.randn(1, 5, 5, 2).astype(np.float32))
    flow = jnp.asarray((rng.randn(1, 5, 5, 2) * 0.5).astype(np.float32))

    def loss(im, fl):
        return jnp.sum(backwarp(im, fl) ** 2)

    gi, gf = jax.grad(loss, argnums=(0, 1))(img, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert np.abs(np.asarray(gf)).sum() > 0


class TestOnehotFormulations:
    """MXU one-hot matmul formulations must match the gather reference
    exactly (f32), including zero-pad boundary semantics and gradients."""

    def _coords(self, n, h, w, ho, wo, seed=3):
        r = np.random.RandomState(seed)
        sy = (r.rand(n, ho, wo) * (h + 4) - 2).astype(np.float32)
        sx = (r.rand(n, wo and ho, wo) * (w + 4) - 2).astype(np.float32)
        return jnp.asarray(sy), jnp.asarray(sx)

    @pytest.mark.parametrize("clamp", [False, True])
    def test_backwarp_coords_onehot_matches_gather(self, clamp):
        from maskflownet_tpu.ops.warp import backwarp_coords
        r = np.random.RandomState(0)
        img = jnp.asarray(r.rand(2, 9, 13, 5).astype(np.float32))
        sy, sx = self._coords(2, 9, 13, 7, 11)
        a = backwarp_coords(img, sy, sx, clamp=clamp, method="gather")
        b = backwarp_coords(img, sy, sx, clamp=clamp, method="onehot")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_backwarp_coords_onehot_grads_match(self):
        from maskflownet_tpu.ops.warp import backwarp_coords
        r = np.random.RandomState(1)
        img = jnp.asarray(r.rand(1, 8, 10, 3).astype(np.float32))
        sy, sx = self._coords(1, 8, 10, 8, 10, seed=4)
        # keep coords off exact integers: |.| grads differ there (measure-zero)
        sy = jnp.floor(sy) + 0.3
        sx = jnp.floor(sx) + 0.6

        def loss(m):
            def f(i, y, x):
                return jnp.sum(backwarp_coords(i, y, x, method=m) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(img, sy, sx)

        ga = loss("gather")
        gb = loss("onehot")
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-4)

    def test_deform_conv_onehot_matches_gather(self):
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(2)
        x = jnp.asarray(r.rand(2, 10, 12, 6).astype(np.float32))
        flow = jnp.asarray((r.rand(2, 10, 12, 2) * 8 - 4).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 6, 4).astype(np.float32) * 0.2)
        bias = jnp.asarray(r.randn(4).astype(np.float32))
        a = flow_guided_deform_conv3x3(x, flow, wgt, bias, method="gather")
        b = flow_guided_deform_conv3x3(x, flow, wgt, bias, method="onehot")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_deform_conv_onehot_boundary_taps(self):
        """Samples whose off-center taps land exactly on the image edge —
        the case that requires the extended [-1, dim] one-hot support."""
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(5)
        x = jnp.asarray(r.rand(1, 6, 7, 2).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 2, 3).astype(np.float32) * 0.3)
        # push every pixel's window center one past the bottom-right corner
        flow = jnp.stack([
            jnp.full((1, 6, 7), 6.0) - jax.lax.broadcasted_iota(
                jnp.float32, (1, 6, 7), 1),
            jnp.full((1, 6, 7), 7.0) - jax.lax.broadcasted_iota(
                jnp.float32, (1, 6, 7), 2),
        ], axis=-1)
        a = flow_guided_deform_conv3x3(x, flow, wgt, None, method="gather")
        b = flow_guided_deform_conv3x3(x, flow, wgt, None, method="onehot")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


class TestUnfoldFormulations:
    """The wide-patch-gather ('unfold') formulations must match the gather
    reference exactly (f32), including zero-pad boundary semantics, far
    out-of-bounds windows, and gradients."""

    @pytest.mark.parametrize("clamp", [False, True])
    def test_backwarp_unfold_matches_gather(self, clamp):
        from maskflownet_tpu.ops.warp import backwarp_coords
        r = np.random.RandomState(0)
        img = jnp.asarray(r.rand(2, 9, 13, 5).astype(np.float32))
        sy = jnp.asarray((r.rand(2, 7, 11) * 17 - 4).astype(np.float32))
        sx = jnp.asarray((r.rand(2, 7, 11) * 21 - 4).astype(np.float32))
        a = backwarp_coords(img, sy, sx, clamp=clamp, method="gather")
        b = backwarp_coords(img, sy, sx, clamp=clamp, method="unfold")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_backwarp_unfold_grads_match(self):
        from maskflownet_tpu.ops.warp import backwarp_coords
        r = np.random.RandomState(1)
        img = jnp.asarray(r.rand(1, 8, 10, 3).astype(np.float32))
        sy = jnp.floor(jnp.asarray((r.rand(1, 8, 10) * 14 - 3))) + 0.3
        sx = jnp.floor(jnp.asarray((r.rand(1, 8, 10) * 16 - 3))) + 0.6

        def grads(m):
            def f(i, y, x):
                return jnp.sum(backwarp_coords(
                    i, y.astype(jnp.float32), x.astype(jnp.float32),
                    method=m) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(img, sy, sx)

        for a, b in zip(grads("gather"), grads("unfold")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_deform_conv_unfold_matches_gather(self):
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(2)
        x = jnp.asarray(r.rand(2, 10, 12, 6).astype(np.float32))
        flow = jnp.asarray((r.rand(2, 10, 12, 2) * 30 - 15).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 6, 4).astype(np.float32) * 0.2)
        bias = jnp.asarray(r.randn(4).astype(np.float32))
        a = flow_guided_deform_conv3x3(x, flow, wgt, bias, method="gather")
        b = flow_guided_deform_conv3x3(x, flow, wgt, bias, method="unfold")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_deform_conv_unfold_grads_match(self):
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(7)
        x = jnp.asarray(r.rand(1, 8, 10, 4).astype(np.float32))
        flow = jnp.asarray(
            (np.floor(r.rand(1, 8, 10, 2) * 10 - 5) + 0.4).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 4, 5).astype(np.float32) * 0.3)

        def grads(m):
            def f(xx, ff, ww):
                return jnp.sum(flow_guided_deform_conv3x3(
                    xx, ff, ww, None, method=m) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(x, flow, wgt)

        for a, b in zip(grads("gather"), grads("unfold")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestWarpconvFormulation:
    """deform == warp(conv3x3(x)) on the one-pixel-extended grid (the
    replicated-offset identity, ``ops/deform.py::_warpconv_deform``): values
    and gradients must match the gather reference exactly, including far
    out-of-bounds windows and edge-straddling corners."""

    def test_deform_conv_warpconv_matches_gather(self):
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(2)
        x = jnp.asarray(r.rand(2, 10, 12, 6).astype(np.float32))
        flow = jnp.asarray((r.rand(2, 10, 12, 2) * 30 - 15).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 6, 4).astype(np.float32) * 0.2)
        bias = jnp.asarray(r.randn(4).astype(np.float32))
        a = flow_guided_deform_conv3x3(x, flow, wgt, bias, method="gather")
        b = flow_guided_deform_conv3x3(x, flow, wgt, bias, method="warpconv")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_deform_conv_warpconv_boundary_corners(self):
        """Window centers landing fractionally outside the image: the
        extended-grid corner at coordinate -1 must still see boundary rows
        through its inward taps (the case a naive warp-of-unextended-conv
        would zero out)."""
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(5)
        x = jnp.asarray(r.rand(1, 6, 7, 2).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 2, 3).astype(np.float32) * 0.3)
        for off in (-1.5, -0.5, 0.5):  # straddle the top-left border
            flow = jnp.stack([
                jnp.full((1, 6, 7), off) - jax.lax.broadcasted_iota(
                    jnp.float32, (1, 6, 7), 1),
                jnp.full((1, 6, 7), off) - jax.lax.broadcasted_iota(
                    jnp.float32, (1, 6, 7), 2),
            ], axis=-1)
            a = flow_guided_deform_conv3x3(x, flow, wgt, None, method="gather")
            b = flow_guided_deform_conv3x3(x, flow, wgt, None,
                                           method="warpconv")
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_deform_conv_warpconv_grads_match(self):
        from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
        r = np.random.RandomState(7)
        x = jnp.asarray(r.rand(1, 8, 10, 4).astype(np.float32))
        flow = jnp.asarray(
            (np.floor(r.rand(1, 8, 10, 2) * 10 - 5) + 0.4).astype(np.float32))
        wgt = jnp.asarray(r.randn(3, 3, 4, 5).astype(np.float32) * 0.3)

        def grads(m):
            def f(xx, ff, ww):
                return jnp.sum(flow_guided_deform_conv3x3(
                    xx, ff, ww, None, method=m) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(x, flow, wgt)

        for a, b in zip(grads("gather"), grads("warpconv")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# two-pass affine resampler (ops/affine2pass.py)
# ---------------------------------------------------------------------------

class TestAffineTwoPass:
    ho, wo = 40, 56

    def _direct(self, img, m, t):
        from maskflownet_tpu.ops.warp import backwarp_coords
        ys, xs = np.meshgrid(np.arange(self.ho, dtype=np.float32),
                             np.arange(self.wo, dtype=np.float32),
                             indexing="ij")
        sy = (m[:, 1, 0, None, None] * xs + m[:, 1, 1, None, None] * ys
              + t[:, 1, None, None])
        sx = (m[:, 0, 0, None, None] * xs + m[:, 0, 1, None, None] * ys
              + t[:, 0, None, None])
        return np.asarray(backwarp_coords(jnp.asarray(img), jnp.asarray(sy),
                                          jnp.asarray(sx), method="gather"))

    def _twopass(self, img, m, t):
        from maskflownet_tpu.ops.affine2pass import affine_sample_twopass
        return np.asarray(affine_sample_twopass(
            jnp.asarray(img), jnp.asarray(m), jnp.asarray(t), self.ho,
            self.wo, sx_max=1.35, sy_max=1.2))

    def test_identity_exact(self):
        rng_ = np.random.RandomState(0)
        img = rng_.rand(2, 48, 64, 3).astype(np.float32)
        m = np.tile(np.eye(2, dtype=np.float32), (2, 1, 1))
        t = np.zeros((2, 2), np.float32)
        got = self._twopass(img, m, t)
        np.testing.assert_allclose(got, img[:, :self.ho, :self.wo], atol=1e-6)

    def test_translation_exact_and_zero_oob(self):
        rng_ = np.random.RandomState(1)
        img = rng_.rand(2, 48, 64, 3).astype(np.float32)
        m = np.tile(np.eye(2, dtype=np.float32), (2, 1, 1))
        # fractional shift; second sample fully out of frame
        t = np.array([[2.3, 4.7], [-70.0, -60.0]], np.float32)
        got = self._twopass(img, m, t)
        want = self._direct(img, m, t)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert np.abs(got[1]).max() == 0.0

    def test_general_affine_interior(self):
        """Rotation+scale: matches direct bilinear on smooth content away
        from the map's source-boundary band (sheared-stencil contract)."""
        yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
        smooth = np.stack([np.sin(yy / 9) * np.cos(xx / 11),
                           (yy + xx) / 112.0,
                           np.cos(xx / 7)], -1)[None].repeat(2, 0)
        ang = np.array([0.3, -0.25], np.float32)
        sc = np.array([1.05, 0.95], np.float32)
        m = np.stack([np.stack([sc * np.cos(ang), -sc * np.sin(ang)], -1),
                      np.stack([sc * np.sin(ang), sc * np.cos(ang)], -1)],
                     1).astype(np.float32)
        t = np.array([[1.2, 2.5], [3.1, -0.7]], np.float32)
        got = self._twopass(smooth.astype(np.float32), m, t)
        want = self._direct(smooth.astype(np.float32), m, t)
        # interior = output pixels whose source point is >2 px inside
        ys, xs = np.meshgrid(np.arange(self.ho), np.arange(self.wo),
                             indexing="ij")
        for i in range(2):
            qx = m[i, 0, 0] * xs + m[i, 0, 1] * ys + t[i, 0]
            qy = m[i, 1, 0] * xs + m[i, 1, 1] * ys + t[i, 1]
            inner = (qx > 2) & (qx < 61) & (qy > 2) & (qy < 45)
            err = np.abs(got[i] - want[i])[inner]
            assert err.max() < 5e-3, err.max()


def test_downsample_inside_jit():
    """Regression: the triangle kernel must be built from compile-time
    constants — jnp.arange under a jit trace yields tracers and float() on
    one raised ConcretizationTypeError, so downsample (and hence the
    'downsampling' multiscale-loss match) crashed inside the compiled train
    step until round 3."""
    rng_ = np.random.RandomState(0)
    x = jnp.asarray(rng_.randn(2, 16, 24, 3).astype(np.float32))
    got = jax.jit(lambda a: downsample(a, 4))(x)
    ref = downsample(x, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    from maskflownet_tpu.losses import multiscale_epe
    flow = jnp.asarray(rng_.randn(2, 64, 64, 2).astype(np.float32))
    mask = jnp.ones((2, 64, 64, 1), jnp.float32)
    preds = [jnp.asarray(rng_.randn(2, 64 // s, 64 // s, 2).astype(np.float32))
             for s in (64, 32, 16, 8, 4)]
    loss = jax.jit(lambda f, m: multiscale_epe(
        f, m, preds, match="downsampling"))(flow, mask)
    assert np.isfinite(np.asarray(loss)).all()


@pytest.mark.parametrize("k,stride,pad", [(4, 2, 1), (3, 1, 1), (2, 2, 0),
                                          (5, 2, 2)])
def test_deconv_pad_output_shapes(k, stride, pad):
    """nn.deconv must honor the transposed-conv output-size formula
    out = (in - 1)*stride - 2*pad + k for non-default kernels/pads (the
    pad used to be hardcoded to 1)."""
    from maskflownet_tpu import nn as fnn
    x = jnp.zeros((1, 6, 7, 3), jnp.float32)

    def fwd(ctx, a):
        return fnn.deconv(ctx, "d", a, 4, k=k, stride=stride, pad=pad)

    params = fnn.init(fwd, jax.random.PRNGKey(0), x)
    out = fwd(fnn.apply_ctx(params), x)
    want_h = (6 - 1) * stride - 2 * pad + k
    want_w = (7 - 1) * stride - 2 * pad + k
    assert out.shape == (1, want_h, want_w, 4), out.shape


def test_deconv_pad_out_of_range():
    from maskflownet_tpu import nn as fnn
    x = jnp.zeros((1, 4, 4, 2), jnp.float32)
    with pytest.raises(ValueError):
        fnn.init(lambda ctx, a: fnn.deconv(ctx, "d", a, 2, k=3, pad=3),
                 jax.random.PRNGKey(0), x)
