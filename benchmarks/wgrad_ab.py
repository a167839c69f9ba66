"""Attack the wgrad layout copies (VERDICT r4 W2b).

Round-4 op traces showed ~6.6 ms/step of pure layout copies, concentrated
on the level-2 dense-block activations: XLA keeps each activation in one
layout for the forward/dgrad convs ({3,0,2,1}) and copies it to a second
({2,3,1,0}) for the wgrad contraction. Layout assignment is not
controllable from JAX, so this benchmark measures every lever we DO have
on an isolated level-2 dense block (the hotspot), fwd+bwd:

  pieces/nhwc    the shipped formulation (conv_pieces, NHWC)
  concat/nhwc    conv-over-concat (MFN_DENSE=concat)
  pieces/nchw    same math with NCHW dimension_numbers -- a different
                 logical layout changes XLA's layout assignment
  pieces/remat   jax.checkpoint over the block: activations are
                 recomputed in the backward pass, so the fwd-layout copy
                 of each stored activation disappears (traded for FLOPs)
  pieces/f32     f32 activations (are the copies bf16-specific?)

plus the same sweep at batch 32 (copies are bandwidth-bound => should
scale linearly; fixed overheads should not).

Run: ``python benchmarks/wgrad_ab.py``
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# level-2 decoder shapes (chairs stage, batch 8): corr81 + feat16 + flow2
# + mask1 = 100 input channels at 80x112, dense growth (128,128,96,64,32)
H, W = 80, 112
CIN = 100
GROWTH = (128, 128, 96, 64, 32)


def make_params(rng, nchw=False):
    params = []
    cin = CIN
    for cout in GROWTH:
        w = (rng.randn(3, 3, cin, cout) * 0.05).astype(np.float32)
        b = np.zeros((cout,), np.float32)
        params.append((jnp.asarray(w), jnp.asarray(b)))
        cin += cout
    return params


def dense_block(params, x, mode, dn):
    """5 convs, each consuming the concat of all previous outputs."""
    pieces = [x]
    for (w, b) in params:
        w = w.astype(x.dtype)
        if mode == "concat":
            inp = jnp.concatenate(pieces, axis=-1 if dn == "NHWC" else 1)
            y = lax.conv_general_dilated(
                inp, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=(dn, "HWIO", dn),
                preferred_element_type=x.dtype)
        else:
            off = 0
            y = None
            for p in pieces:
                c = p.shape[-1 if dn == "NHWC" else 1]
                ww = lax.slice_in_dim(w, off, off + c, axis=2)
                t = lax.conv_general_dilated(
                    p, ww, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=(dn, "HWIO", dn),
                    preferred_element_type=x.dtype)
                y = t if y is None else y + t
                off += c
        if dn == "NHWC":
            y = y + b.astype(x.dtype)
        else:
            y = y + b.astype(x.dtype)[None, :, None, None]
        y = jnp.where(y >= 0, y, 0.1 * y)
        pieces.append(y)
    return pieces[-1]


K = 20


def bench(params, x, mode, dn, remat=False, repeats=5):
    """K-loop carried timing (the only harness that measures honestly on
    this tunneled backend: per-call async dispatch makes naive loops lie --
    block_until_ready returns early for non-donated programs -- and
    per-call sync is RTT-bound; a fori_loop with a carried dependency puts
    K real executions inside ONE dispatch). Grads are folded into the
    carry so nothing is dead-code-eliminated."""
    blk = dense_block
    if remat:
        blk = jax.checkpoint(dense_block, static_argnums=(2, 3))

    def body(x):
        def loss(params):
            return jnp.sum(jnp.abs(blk(params, x, mode, dn)
                                   .astype(jnp.float32)))
        v, g = jax.value_and_grad(loss)(params)
        s = v
        for (gw, gb) in g:
            s = s + jnp.sum(gw) + jnp.sum(gb)
        return x + (1e-12 * s).astype(x.dtype)

    def timed(k):
        run = jax.jit(lambda c: jax.lax.fori_loop(0, k, lambda i, c: body(c),
                                                  c))
        float(jnp.sum(run(x).astype(jnp.float32)))  # compile + drain
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(run(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    # (t(2K) - t(K)) / K cancels the dispatch RTT and the scalar drain
    return (timed(2 * K) - timed(K)) / K * 1e3


def main():
    rng = np.random.RandomState(0)
    params = make_params(rng)
    for batch in (8, 32):
        x_nhwc = jnp.asarray(
            (rng.randn(batch, H, W, CIN) * 0.5).astype(np.float32),
            dtype=jnp.bfloat16)
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        rows = [
            ("pieces/nhwc", dict(mode="pieces", dn="NHWC")),
            ("concat/nhwc", dict(mode="concat", dn="NHWC")),
            ("pieces/nchw", dict(mode="pieces", dn="NCHW")),
            ("pieces/remat", dict(mode="pieces", dn="NHWC", remat=True)),
        ]
        for name, kw in rows:
            x = x_nchw if kw["dn"] == "NCHW" else x_nhwc
            ms = bench(params, x, **kw)
            print(f"b{batch} {name}: {ms:.3f} ms", flush=True)
        ms = bench(params, x_nhwc.astype(jnp.float32), "pieces", "NHWC")
        print(f"b{batch} pieces/f32: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
