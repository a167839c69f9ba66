"""Component microbenchmarks on the attached device.

Times the pieces of the MaskFlownet-S train step at chairs-stage shapes so
perf work targets the real bottleneck. Run: ``python benchmarks/micro.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from maskflownet_tpu.augment import (ColorAugConfig, GeometryAugConfig,
                                         color_augmentation,
                                         geometry_augmentation)
    from maskflownet_tpu.models import ModelConfig, maskflownet_s
    from maskflownet_tpu import nn
    from maskflownet_tpu.ops.correlation import correlation_xla
    from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
    from maskflownet_tpu.ops.warp import backwarp
    from maskflownet_tpu.losses import multiscale_epe

    b, th, tw = 8, 320, 448
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    cfg = ModelConfig()
    im = jnp.zeros((b, th, tw, 3), jnp.float32)
    params = nn.init(maskflownet_s, key, im, im, cfg)
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_par/1e6:.2f}M")

    im1 = jax.random.uniform(key, (b, th, tw, 3), jnp.float32)
    im2 = jax.random.uniform(key, (b, th, tw, 3), jnp.float32)

    def fwd(params, im1, im2):
        preds, occ, _ = maskflownet_s(
            nn.apply_ctx(params, compute_dtype=dt), im1, im2, cfg)
        return preds[-1]

    print(f"forward:            {bench(fwd, params, im1, im2):8.2f} ms")

    flow_label = jax.random.normal(key, (b, th, tw, 2), jnp.float32)

    ones_mask = jnp.ones((b, th, tw, 1), jnp.float32)

    def fwd_loss(params, im1, im2, flow):
        preds, occ, _ = maskflownet_s(
            nn.apply_ctx(params, compute_dtype=dt), im1, im2, cfg)
        return jnp.mean(multiscale_epe(flow, ones_mask, preds,
                                       weights=(.005, .01, .02, .08, .32)))

    def fwd_bwd(params, im1, im2, flow):
        return jax.value_and_grad(fwd_loss)(params, im1, im2, flow)

    print(f"forward+backward:   {bench(fwd_bwd, params, im1, im2, flow_label):8.2f} ms")

    # ops at per-level shapes (chairs 320x448: strides 4..64)
    for (lh, lw, c, md) in [(80, 112, 32, 4), (40, 56, 64, 4),
                            (20, 28, 96, 4), (10, 14, 128, 4)]:
        f1 = jax.random.uniform(key, (b, lh, lw, c), dt)
        f2 = jax.random.uniform(key, (b, lh, lw, c), dt)
        fl = jax.random.normal(key, (b, lh, lw, 2), dt)
        w = jax.random.normal(key, (3, 3, c, c), dt) * 0.1
        t_corr = bench(lambda a, bb: correlation_xla(a, bb, 4), f1, f2)
        t_warp = bench(backwarp, f1, fl)
        t_dc = bench(flow_guided_deform_conv3x3, f1, fl, w)
        print(f"L{lh}x{lw}x{c}: corr {t_corr:7.2f}  warp {t_warp:7.2f}  "
              f"deform {t_dc:7.2f} ms")

    # augmentation at orig shape
    oh, ow = 384, 512
    i1 = jax.random.uniform(key, (b, oh, ow, 3), jnp.float32)
    i2 = jax.random.uniform(key, (b, oh, ow, 3), jnp.float32)
    fl = jax.random.normal(key, (b, oh, ow, 2), jnp.float32)
    geo = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    col = ColorAugConfig()

    mask = jnp.ones((b, oh, ow, 1), jnp.float32)

    def aug(k, i1, i2, fl, m):
        a1, a2, af, am = geometry_augmentation(k, i1, i2, fl, m, geo)
        c1, c2 = color_augmentation(k, a1, a2, col)
        return c1, c2, af, am

    print(f"geometry+color aug: {bench(aug, key, i1, i2, fl, mask):8.2f} ms")


if __name__ == "__main__":
    main()
