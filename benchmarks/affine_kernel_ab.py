import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from maskflownet_tpu.ops.pallas.affine import windowed_sample
from maskflownet_tpu.ops.warp import backwarp_coords

K = 20
def time_loop(body, init, iters=3):
    run = jax.jit(lambda cr: jax.lax.fori_loop(0, K, lambda i, cr: body(cr), cr))
    out = run(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3

r = np.random.RandomState(0)
n, h, w, c = 8, 384, 512, 9
ho, wo = 320, 448
img = jnp.asarray(r.rand(n, h, w, c).astype(np.float32))
yy, xx = np.meshgrid(np.arange(ho, dtype=np.float32), np.arange(wo, dtype=np.float32), indexing="ij")
sy = np.stack([yy * 1.15 + 0.35 * xx * ((i % 2) * 2 - 1) + 5 for i in range(n)]).astype(np.float32)
sx = np.stack([xx * 1.1 - 0.3 * yy * ((i % 2) * 2 - 1) + 3 for i in range(n)]).astype(np.float32)
sy = jnp.asarray(np.clip(sy, -5, h + 4)); sx = jnp.asarray(np.clip(sx, -5, w + 4))

# window per tile (8,112): dy = 1.15*8 + 0.35*112 + 3 = 51.4; dx = 1.1*112 + 0.35*8 + 3 = 129
ref = jax.jit(lambda i, y, x: backwarp_coords(i, y, x, method="gather"))(img, sy, sx)
out = jax.jit(lambda i, y, x: windowed_sample(i, y, x, window=(56, 136), precise_ch=3))(img, sy, sx)
err = np.abs(np.asarray(out) - np.asarray(ref))
print("maxerr precise:", err[..., 6:].max(), "bf16:", err[..., :6].max())

def chain(o, s):
    return s + (jnp.sum(o) * 1e-12).astype(s.dtype)
t_g = time_loop(lambda s: chain(backwarp_coords(img, s, sx, method="gather"), s), sy)
t_p = time_loop(lambda s: chain(windowed_sample(img, s, sx, window=(56, 136), precise_ch=3), s), sy)
print(f"gather {t_g:7.2f} ms   pallas windowed {t_p:7.2f} ms")

# ---- two-pass (Catmull-Smith LU) dense resampler at the same maps ----
from maskflownet_tpu.ops.affine2pass import affine_sample_twopass
mm = np.zeros((n, 2, 2), np.float32)
tt = np.zeros((n, 2), np.float32)
for i in range(n):
    s = (i % 2) * 2 - 1
    mm[i] = [[1.1, -0.3 * s], [0.35 * s, 1.15]]
    tt[i] = [3.0, 5.0]
mm = jnp.asarray(mm); tt = jnp.asarray(tt)
out2 = jax.jit(lambda im, m_, t_: affine_sample_twopass(
    im, m_, t_, ho, wo, sx_max=1.35, sy_max=1.2))(img, mm, tt)
err2 = np.abs(np.asarray(out2) - np.asarray(ref))[:, 3:-3, 3:-3]
print("twopass interior maxerr:", err2.max(), "mean:", err2.mean())
t_2 = time_loop(lambda m_: chain(affine_sample_twopass(
    img, m_, tt, ho, wo, sx_max=1.35, sy_max=1.2), m_), mm)
print(f"twopass {t_2:7.2f} ms")
