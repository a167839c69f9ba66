"""Spatial (H-axis) sharding for very large frames — the TPU-native analog
of "sequence parallelism" for this dense-CNN workload (SURVEY.md §5.7).

The reference has no counterpart: it is bounded by single-GPU memory at
inference. Here, a 2-D ``('data', 'spatial')`` mesh shards the batch over
``data`` and the image rows over ``spatial``; XLA's SPMD partitioner inserts
the halo exchanges (collective-permutes) required by the 3x3 convolutions
and the correlation windows, riding ICI. Warp/deform gathers with unbounded
reach lower to all-gathers of the (coarse, small) source levels.

Intended for inference / validation at resolutions where one chip cannot
hold the activations (e.g. the 2x-resolution multi-host stretch target in
BASELINE.json). Constraints:

  * H must be divisible by 64 * spatial axis size so every pyramid level
    divides evenly. Forward equality vs single-device is tested at H=256
    and H=512 on the virtual 8-device mesh (tests/test_spatial.py).
  * Gradients through the sharded forward are also validated (training-side
    halo exchange), but require level-6 shards of >= 2 rows, i.e.
    H >= 128 * spatial axis size: at 1-row level-6 shards the backward of
    the md=4 correlation halo produces wrong dense-block gradients (XLA
    SPMD edge case, probed round 3 at h=128 on a 2-way spatial mesh).
    Large-frame training — the reason to spatially shard at all — sits far
    above that bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskflownet_tpu import nn
from maskflownet_tpu.ops import upsample

Array = jax.Array


def make_spatial_mesh(n_data: int, n_spatial: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_spatial, (devices.size, n_data, n_spatial)
    grid = devices.flatten()[: n_data * n_spatial].reshape(n_data, n_spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def make_spatial_forward(model_fn, model_cfg, mesh: Mesh,
                         compute_dtype=jnp.bfloat16):
    """Compiled spatially-sharded forward: (params, im1, im2) ->
    (full-res flow, occlusion mask), both sharded like the inputs.

    Inputs im1/im2: (B, H, W, 3) float in [0, 1], H divisible by
    64 * mesh.shape['spatial'], B divisible by mesh.shape['data'].
    """
    img_sh = NamedSharding(mesh, P("data", "spatial", None, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(repl, img_sh, img_sh),
                       out_shardings=(img_sh, img_sh))
    def fwd(params, im1, im2):
        both = jnp.concatenate([im1, im2], axis=1)
        mean = jnp.mean(both, axis=(1, 2), keepdims=True)
        im1 = im1 - mean
        im2 = im2 - mean
        ctx = nn.apply_ctx(params, compute_dtype=compute_dtype)
        preds, occs, _ = model_fn(ctx, im1, im2, model_cfg)
        flow = upsample(preds[-1], 4)
        occ = upsample(occs[0].astype(jnp.float32), 4) if occs else flow[..., :1]
        return flow, occ

    return fwd
