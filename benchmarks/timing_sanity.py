"""Resolve the measurement discrepancy: same op, different harnesses."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from maskflownet_tpu.ops.warp import backwarp

key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (8, 80, 112, 32), jnp.bfloat16)
fl = jax.random.normal(key, (8, 80, 112, 2), jnp.bfloat16) * 3

f_kw = jax.jit(lambda x, fl: backwarp(x, fl, method="gather"))
f_direct = jax.jit(backwarp)   # method auto -> onehot on tpu

def t(f, *a, iters=30):
    for _ in range(3): o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

def t_all(f, *a, iters=30):
    """block on every output (no pipelining)"""
    for _ in range(3): jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3

def t_vary(f, xs, fls, iters=30):
    """different input buffers each call"""
    for i in range(3): o = f(xs[i % 4], fls[i % 4])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters): o = f(xs[i % 4], fls[i % 4])
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

xs = [jax.random.uniform(jax.random.PRNGKey(i), (8, 80, 112, 32), jnp.bfloat16) for i in range(4)]
fls = [jax.random.normal(jax.random.PRNGKey(i), (8, 80, 112, 2), jnp.bfloat16) * 3 for i in range(4)]

print(f"gather lambda, last-sync:   {t(f_kw, x, fl):7.3f} ms")
print(f"gather lambda, all-sync:    {t_all(f_kw, x, fl):7.3f} ms")
print(f"gather lambda, varied in:   {t_vary(f_kw, xs, fls):7.3f} ms")
print(f"auto jit(backwarp), last:   {t(f_direct, x, fl):7.3f} ms")
per_call = jax.jit(lambda x, fl: backwarp(x, fl, method="gather"))
t0 = time.perf_counter()
for _ in range(10):
    jax.block_until_ready(per_call(x, fl))
print(f"gather per-call sync:       {(time.perf_counter()-t0)/10*1e3:7.3f} ms")
# trivial op for dispatch floor
triv = jax.jit(lambda x: x + 1)
print(f"trivial add, last-sync:     {t(triv, x):7.3f} ms")
print(f"trivial add, per-call sync: {t_all(triv, x, iters=10):7.3f} ms")
