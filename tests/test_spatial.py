"""Spatial-sharding correctness: the H-sharded forward over a
(data, spatial) mesh must reproduce the single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu import nn
from maskflownet_tpu.models import ModelConfig, maskflownet_s
from maskflownet_tpu.parallel.spatial import (make_spatial_forward,
                                              make_spatial_mesh)


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 2)])
@pytest.mark.slow
def test_spatial_sharded_forward_matches_unsharded(mesh_shape):
    assert jax.device_count() == 8
    cfg = ModelConfig()
    h, w = 256, 128  # H/64 = 4 divides the spatial axis
    b = 2
    im = jnp.zeros((1, h, w, 3), jnp.float32)
    params = nn.init(maskflownet_s, jax.random.PRNGKey(0), im, im, cfg)
    rng = np.random.RandomState(0)
    im1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))

    mesh = make_spatial_mesh(*mesh_shape)
    fwd = make_spatial_forward(maskflownet_s, cfg, mesh,
                               compute_dtype=jnp.float32)
    flow_sharded, occ_sharded = fwd(params, im1, im2)

    # single-device reference
    def ref(params, a, b_):
        both = jnp.concatenate([a, b_], axis=1)
        mean = jnp.mean(both, axis=(1, 2), keepdims=True)
        preds, occs, _ = maskflownet_s(
            nn.apply_ctx(params), a - mean, b_ - mean, cfg)
        from maskflownet_tpu.ops import upsample
        return upsample(preds[-1], 4), upsample(occs[0], 4)

    flow_ref, occ_ref = jax.jit(ref)(params, im1, im2)
    np.testing.assert_allclose(np.asarray(flow_sharded), np.asarray(flow_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(occ_sharded), np.asarray(occ_ref),
                               rtol=1e-3, atol=1e-4)
