"""A/B the fused Pallas deform-conv kernel vs the gather path on the chip.

Shapes are MaskFlownet-S's per-level deform sites at the chairs stage
(320x448 input, batch 8): levels 2..5 plus the cascade's level-6 site.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas

K = 30


def time_loop(body, init, iters=3):
    run = jax.jit(lambda c: jax.lax.fori_loop(0, K, lambda i, c: body(c), c))
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    shapes = [(80, 112, 32), (40, 56, 64), (20, 28, 96), (10, 14, 128),
              (5, 7, 196)]
    for h, w, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (8, h, w, c), jnp.bfloat16)
        flow = jax.random.normal(jax.random.PRNGKey(1), (8, h, w, 2),
                                 jnp.float32) * 3
        wgt = jax.random.normal(jax.random.PRNGKey(2), (3, 3, c, c),
                                jnp.bfloat16) * 0.1
        try:
            a = np.asarray(jax.jit(lambda x, f: flow_guided_deform_conv3x3(
                x, f, wgt, None, method="gather"))(x, flow), np.float32)
            b = np.asarray(jax.jit(lambda x, f: deform_conv3x3_pallas(
                x, f, wgt))(x, flow), np.float32)
            err = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(a)))

            def chain(out, f):
                d = (jnp.mean(out.astype(jnp.float32)) * 1e-12)
                return f + d.astype(f.dtype)

            tg = time_loop(lambda f: chain(flow_guided_deform_conv3x3(
                x, f, wgt, None, method="gather"), f), flow)
            tp = time_loop(lambda f: chain(deform_conv3x3_pallas(
                x, f, wgt), f), flow)

            def gb(fn):
                def g(f):
                    return jax.grad(lambda ff: jnp.sum(
                        fn(ff).astype(jnp.float32) ** 2))(f)
                return g

            gg = gb(lambda f: flow_guided_deform_conv3x3(
                x, f, wgt, None, method="gather"))
            gp = gb(lambda f: deform_conv3x3_pallas(x, f, wgt))
            tgb = time_loop(lambda f: 0.9 * f + 0.1 * gg(f), flow)
            tpb = time_loop(lambda f: 0.9 * f + 0.1 * gp(f), flow)
            print(f"({h:3d},{w:3d},{c:3d}): fwd gather {tg:7.3f} pallas "
                  f"{tp:7.3f} | f+b gather {tgb:7.3f} pallas {tpb:7.3f} ms"
                  f"  relerr {err:.2e}")
        except Exception as e:
            print(f"({h},{w},{c}): FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
