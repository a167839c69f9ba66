import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from maskflownet_tpu.ops.correlation import correlation_xla
from maskflownet_tpu.ops.pallas.correlation import correlation_pallas

K = 50
def time_loop(body, init, iters=3):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, c: body(c), c))
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

key = jax.random.PRNGKey(0)
for (h, w, c, md) in [(80, 112, 32, 4), (40, 56, 64, 4), (20, 28, 96, 4), (80, 112, 36, 2)]:
    f1 = jax.random.uniform(key, (8, h, w, c), jnp.bfloat16)
    f2 = jax.random.uniform(jax.random.PRNGKey(1), (8, h, w, c), jnp.bfloat16)
    def chain(out, f):
        return f + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(f.dtype)
    try:
        # correctness
        a = np.asarray(jax.jit(lambda a, b: correlation_xla(a, b, md))(f1, f2), np.float32)
        b = np.asarray(jax.jit(lambda a, b: correlation_pallas(a, b, md))(f1, f2), np.float32)
        err = np.max(np.abs(a - b))
        t_x = time_loop(lambda f: chain(correlation_xla(f1, f, md), f), f2)
        t_p = time_loop(lambda f: chain(correlation_pallas(f1, f, md), f), f2)
        # fwd+bwd
        gx = lambda f: jax.grad(lambda ff: jnp.sum(correlation_xla(f1, ff, md).astype(jnp.float32)**2))(f)
        gp = lambda f: jax.grad(lambda ff: jnp.sum(correlation_pallas(f1, ff, md).astype(jnp.float32)**2))(f)
        t_xb = time_loop(lambda f: 0.9 * f + 0.1 * gx(f), f2)
        t_pb = time_loop(lambda f: 0.9 * f + 0.1 * gp(f), f2)
        print(f"({h},{w},{c},md{md}): xla {t_x:6.3f} pallas {t_p:6.3f} | f+b xla {t_xb:6.3f} pallas {t_pb:6.3f} ms  maxerr {err:.2e}")
    except Exception as e:
        print(f"({h},{w},{c},md{md}): FAILED {type(e).__name__}: {str(e)[:200]}")
