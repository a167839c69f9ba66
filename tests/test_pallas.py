"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu.ops.correlation import correlation_xla
from maskflownet_tpu.ops.pallas.correlation import correlation_pallas

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


def test_correlation_pallas_bf16():
    f1 = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.bfloat16)
    want = np.asarray(correlation_xla(f1, f2, 2)).astype(np.float32)
    got = np.asarray(correlation_pallas(f1, f2, 2, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
