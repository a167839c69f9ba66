"""Loop-timed augmentation decomposition at chairs shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from maskflownet_tpu.augment import (ColorAugConfig, GeometryAugConfig,
                                     color_augmentation, geometry_augmentation)
from maskflownet_tpu.ops.warp import grid_sample_normalized, affine_grid

K = 20
def time_loop(body, init, iters=3):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, c: body(c), c))
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

key = jax.random.PRNGKey(0)
b, oh, ow, th, tw = 8, 384, 512, 320, 448
i1 = jax.random.uniform(key, (b, oh, ow, 3))
i2 = jax.random.uniform(key, (b, oh, ow, 3))
fl = jax.random.normal(key, (b, oh, ow, 2))
mk = jnp.ones((b, oh, ow, 1))
geo = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
col = ColorAugConfig()

def mk_key(c):
    return jax.random.fold_in(key, jnp.sum(c).astype(jnp.int32) & 0xffff)

def geo_body(c):  # carry: scalar f32
    a1, a2, af, am = geometry_augmentation(mk_key(c[None]), i1, i2, fl, mk, geo)
    return c + jnp.sum(a1.astype(jnp.float32)) * 1e-12

def col_body(c):
    t1 = i1[:, :th, :tw]; t2 = i2[:, :th, :tw]
    c1, c2 = color_augmentation(mk_key(c[None]), t1, t2, col)
    return c + jnp.sum(c1.astype(jnp.float32)) * 1e-12

def warp_body(c):  # single joint grid sample at orig->target, 6 channels
    theta = jnp.tile(jnp.asarray([[0.8, 0.1, 0.0, -0.1, 0.8, 0.0]]), (b, 1)) + c * 1e-12
    gx, gy = affine_grid(theta, th, tw)
    stack = jnp.concatenate([i1, i2], axis=-1)
    out = grid_sample_normalized(stack, gx, gy)
    return c + jnp.sum(out.astype(jnp.float32)) * 1e-12

z = jnp.zeros((), jnp.float32)
print(f"geometry_augmentation: {time_loop(geo_body, z):7.2f} ms")
print(f"color_augmentation:    {time_loop(col_body, z):7.2f} ms")
print(f"one 6ch grid_sample:   {time_loop(warp_body, z):7.2f} ms")
