"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu.ops.correlation import correlation_xla
from maskflownet_tpu.ops.pallas.correlation import (correlation_pallas,
                                                    correlation_pallas_cmajor)

rng = np.random.RandomState(0)


@pytest.mark.parametrize("md,shape", [
    (4, (2, 8, 12, 16)),
    (2, (1, 6, 10, 8)),
    (4, (1, 10, 14, 196)),
])
def test_correlation_pallas_matches_xla(md, shape):
    f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = np.asarray(correlation_xla(f1, f2, md))
    got = np.asarray(correlation_pallas(f1, f2, md, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("md", [2, 4])
def test_correlation_pallas_grad_matches_xla(md):
    f1 = jnp.asarray(rng.randn(1, 6, 8, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 6, 8, 8).astype(np.float32))
    tgt = jnp.asarray(rng.randn(1, 6, 8, (2 * md + 1) ** 2).astype(np.float32))

    def loss_p(a, b):
        return jnp.sum((correlation_pallas(a, b, md, True) - tgt) ** 2)

    def loss_x(a, b):
        return jnp.sum((correlation_xla(a, b, md) - tgt) ** 2)

    gp1, gp2 = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx1, gx2 = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gx1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("md,shape", [
    (4, (2, 8, 12, 16)),
    (2, (1, 6, 10, 8)),
    (4, (1, 10, 14, 196)),
    (4, (1, 16, 14, 32)),   # level-2-like channel count
])
def test_correlation_cmajor_matches_xla(md, shape):
    f1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = np.asarray(correlation_xla(f1, f2, md))
    got = np.asarray(correlation_pallas_cmajor(f1, f2, md, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("md", [2, 4])
def test_correlation_cmajor_grad_matches_xla(md):
    f1 = jnp.asarray(rng.randn(1, 6, 8, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 6, 8, 8).astype(np.float32))
    tgt = jnp.asarray(rng.randn(1, 6, 8, (2 * md + 1) ** 2).astype(np.float32))

    def loss_p(a, b):
        return jnp.sum((correlation_pallas_cmajor(a, b, md, True) - tgt) ** 2)

    def loss_x(a, b):
        return jnp.sum((correlation_xla(a, b, md) - tgt) ** 2)

    gp1, gp2 = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx1, gx2 = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gx1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)


def test_correlation_pallas_bf16():
    f1 = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.bfloat16)
    want = np.asarray(correlation_xla(f1, f2, 2)).astype(np.float32)
    got = np.asarray(correlation_pallas(f1, f2, 2, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# Fused deformable-conv kernel


def _deform_ref(x, flow, weight):
    from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
    return flow_guided_deform_conv3x3(x, flow, weight, None, method="gather")


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 12, 16), 16),
    ((1, 10, 14, 8), 24),
    ((1, 5, 7, 12), 12),
])
def test_deform_pallas_matches_gather(shape, cout):
    from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas
    n, h, w, cin = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    flow = jnp.asarray((rng.randn(n, h, w, 2) * 2.5).astype(np.float32))
    wgt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2)
    want = np.asarray(_deform_ref(x, flow, wgt))
    got = np.asarray(deform_conv3x3_pallas(x, flow, wgt, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_pallas_out_of_bounds_zero():
    """Windows pushed fully outside the image must contribute zero."""
    from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    wgt = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
    for mag in (50.0, -50.0, 7.5, -3.2):
        flow = jnp.full((1, 8, 8, 2), mag, jnp.float32)
        want = np.asarray(_deform_ref(x, flow, wgt))
        got = np.asarray(deform_conv3x3_pallas(x, flow, wgt, True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_deform_pallas_grads_match_gather():
    from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas
    n, h, w, cin, cout = 2, 6, 10, 8, 12
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    flow = jnp.asarray((rng.randn(n, h, w, 2) * 2.0 + 0.3).astype(np.float32))
    wgt = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.3)
    tgt = jnp.asarray(rng.randn(n, h, w, cout).astype(np.float32))

    def loss_p(x, f, wg):
        return jnp.sum((deform_conv3x3_pallas(x, f, wg, True) - tgt) ** 2)

    def loss_g(x, f, wg):
        return jnp.sum((_deform_ref(x, f, wg) - tgt) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, flow, wgt)
    gg = jax.grad(loss_g, argnums=(0, 1, 2))(x, flow, wgt)
    for a, b, name in zip(gp, gg, ("dx", "dflow", "dweight")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)




def test_deform_pallas_bf16():
    from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas
    x = jnp.asarray(rng.randn(1, 8, 12, 16), jnp.bfloat16)
    flow = jnp.asarray(rng.randn(1, 8, 12, 2) * 2, jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.2, jnp.bfloat16)
    want = np.asarray(_deform_ref(x, flow, wgt)).astype(np.float32)
    got = np.asarray(deform_conv3x3_pallas(x, flow, wgt, True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("fn", [correlation_pallas, correlation_pallas_cmajor])
@pytest.mark.parametrize("md", [2, 4])
def test_correlation_fused_leaky_matches_xla(fn, md):
    """leaky=0.1 fused epilogue == LeakyReLU(correlation_xla), values+grads."""
    f1 = jnp.asarray(rng.randn(1, 8, 10, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 10, 8).astype(np.float32))
    tgt = jnp.asarray(rng.randn(1, 8, 10, (2 * md + 1) ** 2).astype(np.float32))

    def loss_p(a, b):
        return jnp.sum((fn(a, b, md, True, 0.1) - tgt) ** 2)

    def loss_x(a, b):
        c = correlation_xla(a, b, md)
        return jnp.sum((jnp.where(c >= 0, c, 0.1 * c) - tgt) ** 2)

    np.testing.assert_allclose(
        np.asarray(fn(f1, f2, md, True, 0.1)),
        np.asarray(jnp.where(correlation_xla(f1, f2, md) >= 0,
                             correlation_xla(f1, f2, md),
                             0.1 * correlation_xla(f1, f2, md))),
        rtol=1e-5, atol=1e-5)
    gp = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
