"""A/B the in-step aug resampling formulations at the chairs step shape.

The headline step spends ~15.7 ms on in-step geometric augmentation
(PERF.md): two `affine_sample_twopass` calls — packed img1+mask+flow*mask
(6ch, f32) through m1, and img2 (3ch, f32) through m2. VERDICT r3 #3a asks
for <= 8 ms via (a) bf16 image channels (labels stay f32) and (b) tightened
static slab bounds (the scale clamp at geometry.py:201-202 caps the true
pixel-space X-pass scale well below the raw config product).

Variants (all at batch 8, 384x512 -> 320x448):
  split_f32      : the round-3 production path (6ch f32 + 3ch f32)
  img_bf16       : img1+img2 stacked (2N, 3ch) bf16 + labels (3ch) f32
  img_bf16_tight : same, with clamp-derived sx_max
  full_geo       : geometry_augmentation() end to end (for the total)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from maskflownet_tpu.augment.geometry import (GeometryAugConfig,
                                              _twopass_bounds,
                                              geometry_augmentation)
from maskflownet_tpu.ops.affine2pass import affine_sample_twopass

K = 20


def time_loop(body, init, iters=4):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, c: body(c), c))
    out = run(init)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


key = jax.random.PRNGKey(0)
b, oh, ow, th, tw = 8, 384, 512, 320, 448
i1 = jax.random.uniform(key, (b, oh, ow, 3))
i2 = jax.random.uniform(key, (b, oh, ow, 3))
fl = jax.random.normal(key, (b, oh, ow, 2)) * 4
mk = jnp.ones((b, oh, ow, 1))
cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
sx_max, sy_max, shear_max = _twopass_bounds(cfg)
print(f"config bounds: sx={sx_max:.3f} sy={sy_max:.3f} shear={shear_max:.3f}")

# representative affine maps (pixel space), mildly rotated/zoomed
import numpy as np

rng = np.random.RandomState(0)
rots = rng.uniform(-0.3, 0.3, b)
scales = rng.uniform(0.75, 1.0, b)


def make_maps(extra_rot=0.0, extra_scale=1.0):
    ms, ts = [], []
    for i in range(b):
        r = rots[i] + extra_rot
        s = scales[i] * extra_scale
        ms.append([[s * np.cos(r), -s * np.sin(r)],
                   [s * np.sin(r), s * np.cos(r)]])
        ts.append([20.0 * rng.rand(), 15.0 * rng.rand()])
    return jnp.asarray(ms, jnp.float32), jnp.asarray(ts, jnp.float32)


m1, t1 = make_maps()
m2, t2 = make_maps(0.02, 1.02)
packed6 = jnp.concatenate([i1, mk, fl * mk], axis=-1)
lab3 = jnp.concatenate([mk, fl * mk], axis=-1)
img_stack = jnp.concatenate([i1, i2], axis=0).astype(jnp.bfloat16)
m12 = jnp.concatenate([m1, m2], axis=0)
t12 = jnp.concatenate([t1, t2], axis=0)


def bump(x, c):
    return x + (c * 1e-20).astype(x.dtype)


def split_f32(c):
    a = affine_sample_twopass(bump(packed6, c), m1, t1, th, tw,
                              sx_max=sx_max, sy_max=sy_max,
                              shear_max=shear_max)
    bx = affine_sample_twopass(bump(i2, c), m2, t2, th, tw,
                               sx_max=sx_max, sy_max=sy_max,
                               shear_max=shear_max)
    return c + jnp.sum(a.astype(jnp.float32)) * 1e-12 \
        + jnp.sum(bx.astype(jnp.float32)) * 1e-12


def img_bf16(c, sx=sx_max):
    ims = affine_sample_twopass(bump(img_stack, c), m12, t12, th, tw,
                                sx_max=sx, sy_max=sy_max,
                                shear_max=shear_max)
    lab = affine_sample_twopass(bump(lab3, c), m1, t1, th, tw,
                                sx_max=sx, sy_max=sy_max,
                                shear_max=shear_max)
    return c + jnp.sum(ims.astype(jnp.float32)) * 1e-12 \
        + jnp.sum(lab.astype(jnp.float32)) * 1e-12


def full_geo(c):
    kk = jax.random.fold_in(key, (c * 1e20).astype(jnp.int32) & 0xffff)
    a1, a2, af, am = geometry_augmentation(kk, i1, i2, fl, mk, cfg)
    return c + jnp.sum(a1.astype(jnp.float32)) * 1e-12


z = jnp.zeros((), jnp.float32)
print(f"split_f32 (r3 production): {time_loop(split_f32, z):7.2f} ms")
print(f"img_bf16 (2N stack + f32 labels): {time_loop(img_bf16, z):7.2f} ms")
tight = min(sx_max, 1.215)
print(f"img_bf16_tight (sx={tight:.3f}): "
      f"{time_loop(lambda c: img_bf16(c, tight), z):7.2f} ms")
print(f"geometry_augmentation total: {time_loop(full_geo, z):7.2f} ms")
