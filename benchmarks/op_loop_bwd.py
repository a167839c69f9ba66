"""Loop-timed fwd+bwd for warp/deform, gather vs onehot."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from maskflownet_tpu.ops.warp import backwarp
from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3

K = 30
def time_loop(body, init, iters=3):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, c: body(c), c))
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

key = jax.random.PRNGKey(0)
for (h, w, c) in [(80, 112, 32), (40, 56, 64)]:
    x = jax.random.uniform(key, (8, h, w, c), jnp.bfloat16)
    wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.1
    fl0 = jax.random.normal(key, (8, h, w, 2), jnp.bfloat16) * 3
    for m in ("gather", "onehot"):
        def wb(fl, m=m):
            g = jax.grad(lambda ff, xx: jnp.sum(
                backwarp(xx, ff, method=m).astype(jnp.float32) ** 2),
                argnums=(0, 1))(fl, x)
            return fl + 1e-9 * g[0].astype(fl.dtype)
        def db(fl, m=m):
            g = jax.grad(lambda ff, xx, ww: jnp.sum(
                flow_guided_deform_conv3x3(xx, ff, ww, method=m).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2))(fl, x, wgt)
            return fl + 1e-9 * g[0].astype(fl.dtype)
        try:
            tw_ = time_loop(wb, fl0)
        except Exception as e:
            tw_ = float("nan"); print("warp fail", str(e)[:80])
        try:
            td_ = time_loop(db, fl0)
        except Exception as e:
            td_ = float("nan"); print("deform fail", str(e)[:80])
        print(f"({h},{w},{c}) {m:7s}: warp f+b {tw_:7.3f}  deform f+b {td_:7.3f} ms")
