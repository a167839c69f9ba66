"""Honest per-op timing on an async/tunneled backend: run K dependent
repetitions of the op inside ONE jitted program; one sync at the end.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from maskflownet_tpu.ops.warp import backwarp
from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
from maskflownet_tpu.ops.correlation import correlation_xla

K = 50

def time_loop(build_body, init, iters=3):
    """build_body: carry -> carry with one op application inside."""
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, K, lambda i, c: build_body(c), c)
    out = run(init)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

key = jax.random.PRNGKey(0)

print("== model-level ops (batch 8, bf16) ==")
for (h, w, c) in [(80, 112, 32), (40, 56, 64), (20, 28, 96)]:
    x = jax.random.uniform(key, (8, h, w, c), jnp.bfloat16)
    fl = jax.random.normal(key, (8, h, w, 2), jnp.bfloat16) * 3
    wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.1

    def chain(out, fl):
        # feed a scalar of the output back into the flow: true dependency
        return fl + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(fl.dtype)

    r = {}
    for m in ("gather", "onehot"):
        r[f"warp_{m}"] = time_loop(
            lambda fl, m=m: chain(backwarp(x, fl, method=m), fl), fl)
        r[f"deform_{m}"] = time_loop(
            lambda fl, m=m: chain(flow_guided_deform_conv3x3(x, fl, wgt, method=m), fl), fl)
    x2 = jax.random.uniform(jax.random.PRNGKey(1), (8, h, w, c), jnp.bfloat16)
    r["corr_xla"] = time_loop(
        lambda fl: chain(correlation_xla(x, x2 + fl[..., :1] * 0, 4), fl), fl)
    print(f"  ({h},{w},{c}): " + "  ".join(f"{k} {v:6.3f}" for k, v in r.items()), "ms")

print("== fwd / fwd+bwd (already reliable, for reference) ==")
