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


@pytest.mark.parametrize("mesh_shape,h", [((1, 4), 256), ((2, 2), 256),
                                          ((1, 4), 512)])
@pytest.mark.slow
def test_spatial_sharded_forward_matches_unsharded(mesh_shape, h):
    assert jax.device_count() == 8
    cfg = ModelConfig()
    w = 128  # H/64 divides the spatial axis at both tested heights
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


@pytest.mark.slow
def test_spatial_sharded_gradient_matches_unsharded():
    """Training-side halo path: gradients THROUGH the spatially-sharded
    forward (halo exchanges in both directions) must match the single-device
    gradients — validating that spatial sharding is usable for training, not
    just inference."""
    assert jax.device_count() == 8
    from jax.sharding import NamedSharding, PartitionSpec as P
    from maskflownet_tpu.ops import upsample

    cfg = ModelConfig()
    # H/64 = 4 rows at level 6 over 2 spatial shards = 2 rows each. The
    # backward pass needs level-6 shards >= 2 rows: at 1-row shards (h=128
    # on a 2-way spatial mesh) the halo-exchange transpose produces wrong
    # dense-block gradients (XLA SPMD edge case, probed in round 3) -- the
    # training-side constraint is H >= 128 * spatial_axis_size, documented
    # in parallel/spatial.py.
    h, w, b = 256, 128, 2
    im = jnp.zeros((1, h, w, 3), jnp.float32)
    params = nn.init(maskflownet_s, jax.random.PRNGKey(0), im, im, cfg)
    rng = np.random.RandomState(1)
    im1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32))

    def loss(params, a, b_):
        preds, _, _ = maskflownet_s(nn.apply_ctx(params), a, b_, cfg)
        return jnp.mean((upsample(preds[-1], 4) - tgt) ** 2)

    mesh = make_spatial_mesh(2, 2)
    img_sh = NamedSharding(mesh, P("data", "spatial", None, None))
    repl = NamedSharding(mesh, P())
    g_sharded = jax.jit(jax.grad(loss),
                        in_shardings=(repl, img_sh, img_sh),
                        out_shardings=repl)(params, im1, im2)
    g_ref = jax.jit(jax.grad(loss))(params, im1, im2)
    for k in sorted(g_ref):
        a = np.asarray(g_sharded[k])
        r = np.asarray(g_ref[k])
        # f32 reduction order differs across the sharded all-reduce; the
        # observed noise floor is ~1% relative on isolated elements
        np.testing.assert_allclose(a, r, rtol=3e-2,
                                   atol=2e-3 * max(1.0, np.abs(r).max()),
                                   err_msg=k)


@pytest.mark.slow
def test_spatial_sharded_forward_cascade():
    """H-axis spatial sharding composed with the FULL cascade (VERDICT r4
    task #7): the second dual pyramid, the dual md=2 correlations and the
    head->stage-2 handoff tensors (c30/c40 at full resolution) must all
    partition correctly under GSPMD."""
    assert jax.device_count() == 8
    from maskflownet_tpu.models import maskflownet

    cfg = ModelConfig()
    h, w, b = 256, 128, 2
    im = jnp.zeros((1, h, w, 3), jnp.float32)
    params = nn.init(maskflownet, jax.random.PRNGKey(0), im, im, cfg)
    rng = np.random.RandomState(5)
    im1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))

    mesh = make_spatial_mesh(2, 2)
    fwd = make_spatial_forward(maskflownet, cfg, mesh,
                               compute_dtype=jnp.float32)
    flow_sharded, vis_sharded = fwd(params, im1, im2)

    def ref(params, a, b_):
        both = jnp.concatenate([a, b_], axis=1)
        mean = jnp.mean(both, axis=(1, 2), keepdims=True)
        preds, visuals, _ = maskflownet(
            nn.apply_ctx(params), a - mean, b_ - mean, cfg)
        from maskflownet_tpu.ops import upsample
        return upsample(preds[-1], 4), upsample(visuals[0], 4)

    flow_ref, vis_ref = jax.jit(ref)(params, im1, im2)
    np.testing.assert_allclose(np.asarray(flow_sharded), np.asarray(flow_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vis_sharded), np.asarray(vis_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_spatial_sharded_forward_s2d():
    """The space-to-depth pyramid path (the TPU default, cfg.s2d) must
    compose with H-axis spatial sharding: GSPMD has to partition the s2d
    reshape and the 2x2/pad(1,0) expanded-kernel convs with correct halos."""
    assert jax.device_count() == 8
    cfg = ModelConfig(s2d=True)
    h, w, b = 256, 128, 2
    im = jnp.zeros((1, h, w, 3), jnp.float32)
    params = nn.init(maskflownet_s, jax.random.PRNGKey(0), im, im, cfg)
    rng = np.random.RandomState(2)
    im1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))

    mesh = make_spatial_mesh(2, 2)
    fwd = make_spatial_forward(maskflownet_s, cfg, mesh,
                               compute_dtype=jnp.float32)
    flow_sharded, occ_sharded = fwd(params, im1, im2)

    ref_cfg = ModelConfig(s2d=False)

    def ref(params, a, b_):
        both = jnp.concatenate([a, b_], axis=1)
        mean = jnp.mean(both, axis=(1, 2), keepdims=True)
        preds, occs, _ = maskflownet_s(
            nn.apply_ctx(params), a - mean, b_ - mean, ref_cfg)
        from maskflownet_tpu.ops import upsample
        return upsample(preds[-1], 4), upsample(occs[0], 4)

    flow_ref, occ_ref = jax.jit(ref)(params, im1, im2)
    np.testing.assert_allclose(np.asarray(flow_sharded), np.asarray(flow_ref),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(occ_sharded), np.asarray(occ_ref),
                               rtol=1e-3, atol=1e-4)
