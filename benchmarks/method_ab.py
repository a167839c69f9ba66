"""A/B gather vs onehot for warp and deform conv, fwd and fwd+bwd, idle TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from maskflownet_tpu.ops.warp import backwarp
from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3

def t(f, *a, iters=30):
    for _ in range(3): o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

key = jax.random.PRNGKey(0)
for (h, w, c) in [(80, 112, 32), (40, 56, 64), (160, 224, 16)]:
    x = jax.random.uniform(key, (8, h, w, c), jnp.bfloat16)
    fl = jax.random.normal(key, (8, h, w, 2), jnp.bfloat16) * 3
    wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.1
    print(f"shape ({h},{w},{c}):")
    for m in ("gather", "onehot"):
        fw = jax.jit(lambda x, fl: backwarp(x, fl, method=m))
        gw = jax.jit(jax.grad(lambda x, fl: jnp.sum(backwarp(x, fl, method=m).astype(jnp.float32)**2), argnums=(0,1)))
        fd = jax.jit(lambda x, fl, wg: flow_guided_deform_conv3x3(x, fl, wg, method=m))
        gd = jax.jit(jax.grad(lambda x, fl, wg: jnp.sum(flow_guided_deform_conv3x3(x, fl, wg, method=m).astype(jnp.float32)**2), argnums=(0,1,2)))
        print(f"  {m:7s} warp f {t(fw,x,fl):7.2f}  f+b {t(gw,x,fl):7.2f}   "
              f"deform f {t(fd,x,fl,wgt):7.2f}  f+b {t(gd,x,fl,wgt):7.2f} ms")
