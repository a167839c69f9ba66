"""A/B the deform-conv formulations on the chip: 'gather' (16 corner
gathers), 'unfold' (one wide patch gather), 'warpconv' (conv-then-warp via
the replicated-offset identity), 'onehot' (MXU matmuls), and the fused
Pallas kernel.

Shapes are MaskFlownet-S's per-level deform sites at the chairs stage
(320x448 input, batch 8): levels 2..5 plus the cascade's level-6 site.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from maskflownet_tpu.ops.deform import flow_guided_deform_conv3x3
from maskflownet_tpu.ops.pallas.deform import deform_conv3x3_pallas

K = 30
METHODS = os.environ.get(
    "MFN_AB_METHODS", "gather,unfold,warpconv,pallas").split(",")


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

        def op(m):
            if m == "pallas":
                return lambda xx, f: deform_conv3x3_pallas(xx, f, wgt)
            return lambda xx, f: flow_guided_deform_conv3x3(
                xx, f, wgt, None, method=m)

        try:
            ref = np.asarray(jax.jit(op("gather"))(x, flow), np.float32)
        except Exception as e:
            print(f"({h:3d},{w:3d},{c:3d}): gather reference FAILED "
                  f"({type(e).__name__}) -- skipping shape")
            continue
        print(f"({h:3d},{w:3d},{c:3d}):")
        for m in METHODS:
            try:
                got = np.asarray(jax.jit(op(m))(x, flow), np.float32)
                err = np.max(np.abs(ref - got)) / max(1e-6, np.max(np.abs(ref)))

                def chain(out, f):
                    d = (jnp.mean(out.astype(jnp.float32)) * 1e-12)
                    return f + d.astype(f.dtype)

                fn = op(m)
                tf = time_loop(lambda f: chain(fn(x, f), f), flow)

                def g(f):
                    return jax.grad(lambda ff: jnp.sum(
                        fn(x, ff).astype(jnp.float32) ** 2))(f)
                tb = time_loop(lambda f: 0.9 * f + 0.1 * g(f), flow)
                print(f"  {m:9s} fwd {tf:7.3f}  f+b {tb:7.3f} ms"
                      f"  relerr {err:.2e}")
            except Exception as e:
                print(f"  {m:9s} FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
