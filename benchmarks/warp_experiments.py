"""Compare bilinear-warp formulations on TPU.

Candidates:
  A. take_along_axis 4-corner gather (current ops/warp.py)
  B. one-hot bilinear matmul, tiled over output rows (MXU as gather engine)
  C. Pallas kernel with in-kernel take_along_axis (probe Mosaic support)

Measures forward and forward+backward (d/dimg and d/dflow) at model-warp and
augmentation shapes. Run: ``python benchmarks/warp_experiments.py``.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


# ---------------------------------------------------------------- A: current
from maskflownet_tpu.ops.warp import backwarp_coords


# ------------------------------------------------------- B: one-hot matmul
def onehot_warp(img, sy, sx, *, row_tile=16):
    """Bilinear sample img (N,H,W,C) at (sy, sx) each (N,Ho,Wo) via two
    one-hot contractions on the MXU. Zero padding outside."""
    n, h, w, c = img.shape
    _, ho, wo = sy.shape
    dtype = img.dtype
    img_flat = img.reshape(n, h, w * c)

    # bilinear one-hot weights: wy[p, hh] = relu(1 - |sy_p - hh|)
    hh = jnp.arange(h, dtype=jnp.float32)
    ww = jnp.arange(w, dtype=jnp.float32)

    nt = ho // row_tile
    sy_t = sy.reshape(n, nt, row_tile * wo)
    sx_t = sx.reshape(n, nt, row_tile * wo)

    def tile(carry, t):
        syt, sxt = t  # (N, P)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(syt[..., None] - hh)).astype(dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sxt[..., None] - ww)).astype(dtype)
        # (N,P,H) @ (N,H,W*C) -> (N,P,W*C)
        rows = jax.lax.dot_general(
            wy, img_flat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype)
        rows = rows.reshape(rows.shape[0], rows.shape[1], w, c)
        out = jnp.einsum("npw,npwc->npc", wx, rows)
        return carry, out

    _, outs = jax.lax.scan(tile, None, (sy_t.transpose(1, 0, 2),
                                        sx_t.transpose(1, 0, 2)))
    return outs.transpose(1, 0, 2, 3).reshape(n, ho, wo, c)


# ------------------------------------------------- C: pallas in-kernel take
def pallas_take_warp(img, sy, sx):
    from jax.experimental import pallas as pl

    n, h, w, c = img.shape
    _, ho, wo = sy.shape

    def kernel(img_ref, sy_ref, sx_ref, out_ref):
        im = img_ref[0]          # (H, W, C)
        syv = sy_ref[0]          # (Ho, Wo)
        sxv = sx_ref[0]
        y0 = jnp.floor(syv)
        x0 = jnp.floor(sxv)
        fy = (syv - y0)[..., None]
        fx = (sxv - x0)[..., None]
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
        flat = im.reshape(h * w, c)
        acc = jnp.zeros((ho, wo, c), im.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                idx = (y0i + dy) * w + (x0i + dx)
                v = jnp.take(flat, idx.reshape(-1), axis=0)
                v = v.reshape(ho, wo, c)
                wgt = ((fy if dy else 1 - fy) * (fx if dx else 1 - fx))
                acc = acc + v * wgt.astype(im.dtype)
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), img.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, ho, wo), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ho, wo), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0)),
    )(img, sy, sx)


def run_case(name, n, h, w, c, ho, wo, dtype):
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (n, h, w, c), dtype)
    sy = jax.random.uniform(key, (n, ho, wo), jnp.float32, -1.0, h + 0.5)
    sx = jax.random.uniform(key, (n, ho, wo), jnp.float32, -1.0, w + 0.5)

    ref = None
    print(f"-- {name}: img ({n},{h},{w},{c}) -> ({ho},{wo}) {dtype.__name__}")
    for label, fn in [
        ("A take_along", lambda i, y, x: backwarp_coords(i, y, x)),
        ("B one-hot mm", onehot_warp),
        ("C pallas take", pallas_take_warp),
    ]:
        try:
            jf = jax.jit(fn)
            out = jf(img, sy, sx)
            jax.block_until_ready(out)
            if ref is None:
                ref = np.asarray(out, np.float32)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            t_f = timeit(jf, img, sy, sx)

            def loss(i, y, x, fn=fn):
                return jnp.sum(fn(i, y, x).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_b = timeit(g, img, sy, sx)
            print(f"   {label}: fwd {t_f:7.2f} ms   fwd+bwd {t_b:7.2f} ms"
                  f"   maxerr {err:.2e}")
        except Exception as e:
            print(f"   {label}: FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    # model warp, finest level (stride 4 of 320x448, 32ch)
    run_case("model L2", 8, 80, 112, 32, 80, 112, jnp.bfloat16)
    # augmentation joint warp (img1 3 + flow 2 + mask 1 at orig->target)
    run_case("aug", 8, 384, 512, 8, 320, 448, jnp.float32)
    run_case("aug bf16", 8, 384, 512, 8, 320, 448, jnp.bfloat16)
