"""A/B: correlation formulations per pyramid level on the real chip.

Shapes are the chairs-stage (320x448 target) pyramid footprints; level 2
(80x112) is the dominant one. 'cmajor' is the channel-major Pallas family
(W on lanes, sublane channel reduction)."""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from maskflownet_tpu.ops.correlation import correlation_xla
from maskflownet_tpu.ops.pallas.correlation import (correlation_pallas,
                                                    correlation_pallas_cmajor)

K = 50
def time_loop(body, init, iters=3):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, c: body(c), c))
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

import functools


def _leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _xla_leaky(f1, f2, md):
    return _leaky(correlation_xla(f1, f2, md))


def _cmajor_leaky(f1, f2, md):
    return correlation_pallas_cmajor(f1, f2, md, False, 0.1)


def _nhwc_leaky(f1, f2, md):
    return correlation_pallas(f1, f2, md, False, 0.1)


# backward ablation: Pallas (H-major) forward, XLA autodiff backward --
# isolates how much the hand-written backward kernels actually buy
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _cmajor_fwd_xla_bwd(f1, f2, md):
    return correlation_pallas_cmajor(f1, f2, md)


def _hyb_fwd(f1, f2, md):
    return correlation_pallas_cmajor(f1, f2, md), (f1, f2)


def _hyb_bwd(md, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: correlation_xla(a, b, md), f1, f2)
    return vjp(g)


_cmajor_fwd_xla_bwd.defvjp(_hyb_fwd, _hyb_bwd)

VARIANTS = {
    "xla": correlation_xla,
    "pallas": correlation_pallas,
    "cmajor": correlation_pallas_cmajor,
    "xla+lk": _xla_leaky,
    "cmaj+lk": _cmajor_leaky,
    "nhwc+lk": _nhwc_leaky,
    "cmaj/xlabwd": _cmajor_fwd_xla_bwd,
}

key = jax.random.PRNGKey(0)
SHAPES = [
    ("L2 md4", 80, 112, 32, 4),
    ("L3 md4", 40, 56, 64, 4),
    ("L4 md4", 20, 28, 96, 4),
    ("L5 md4", 10, 14, 128, 4),
    ("L6 md4", 5, 7, 196, 4),
    ("L2 md2", 80, 112, 32, 2),
    ("L3 md2", 40, 56, 64, 2),
]
for (tag, h, w, c, md) in SHAPES:
    f1 = jax.random.uniform(key, (8, h, w, c), jnp.bfloat16)
    f2 = jax.random.uniform(jax.random.PRNGKey(1), (8, h, w, c), jnp.bfloat16)
    ref = np.asarray(jax.jit(lambda a, b: correlation_xla(a, b, md))(f1, f2),
                     np.float32)
    def chain(out, f):
        return f + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(f.dtype)
    row = [f"{tag} ({h}x{w}x{c})"]
    for name, fn in VARIANTS.items():
        try:
            got = np.asarray(jax.jit(lambda a, b: fn(a, b, md))(f1, f2),
                             np.float32)
            want = np.where(ref >= 0, ref, 0.1 * ref) if "+lk" in name else ref
            err = np.max(np.abs(got - want))
            t_f = time_loop(lambda f: chain(fn(f1, f, md), f), f2)
            gfn = lambda f: jax.grad(lambda ff: jnp.sum(
                fn(f1, ff, md).astype(jnp.float32) ** 2))(f)
            t_fb = time_loop(lambda f: 0.9 * f + 0.1 * gfn(f), f2)
            row.append(f"{name} {t_f:7.3f}/{t_fb:7.3f}ms e{err:.0e}")
        except Exception as e:
            row.append(f"{name} FAILED({type(e).__name__})")
    print(" | ".join(row), flush=True)
