"""Two-pass (Catmull-Smith) affine resampling — dense TPU formulation.

Why: the device-side geometric augmentation must bilinearly sample two
full-resolution tensors through per-image affine maps every train step.
Per-pixel formulations are gather-descriptor-bound on TPU: a (8, 320, 448)
output grid costs ~1.15M descriptors per tensor => ~25 ms each, and even a
windowed Pallas MXU sampler only reaches ~48 ms at this shape
(program-overhead bound; benchmarks/affine_kernel_ab.py). This module
exploits the *affine* structure of the map to replace per-pixel gathers
with per-row-BLOCK slab gathers (hundreds of descriptors) plus dense
VPU/MXU work.

Factorization (LU): an affine map q = M p + t with M = [[a, b], [c, d]]
(x-row first) decomposes into two 1-D resampling passes

    X-pass:  t1(x, v) = in(U(x, v), v),  U = (det/d) x + (b/d) v + tx - (b/d) ty
    Y-pass: out(x, y) = t1(x, V(x, y)),  V = c x + d y + ty

so that U(x, V(x, y)) = a x + b y + tx exactly. Each pass resamples along
ONE axis at positions ``scale_n * x + off(n, line)`` with a per-image
uniform scale and a per-line offset that is LINEAR in the line index.
Per pass, measured on v5e at the augmentation shape (8x384x512x9 -> 448
wide; /tmp profiles, round 3):

  1. per-line offset -> integer ``base`` + fraction. Lines are grouped in
     blocks of G=128; one contiguous-slab gather per BLOCK — the naive
     per-line vmap(dynamic_slice) was 97 ms (XLA serializes it), per-pixel
     take_along_axis 44 ms, and per-ROW single-gather ~10 ms. The gather is
     descriptor-SERIALIZATION bound on this backend (~60-70 GB/s effective
     regardless of payload shape; round-4 sweep: G=8/16/32/64/128/192 ->
     13.2/8.3/6.6/4.8/4.2/5.5 ms for the full aug pair), so the fewest,
     largest descriptors win until roll cost takes over past G~128.
  2. the within-block residual (<= ceil(|slope| * G), slope = b/d or c,
     < 1 for augmentation-strength transforms) is applied by binary
     powers-of-two rolls — dense ``where(bit, shift_k, x)`` selects.
  3. the per-line fraction is a dense 2-tap lerp along the slab axis.
  4. the per-image uniform scale becomes a batched one-hot matmul
     (slab (N, R*C, W) x hat-weights (N, W, O), two nonzeros per column,
     ~0.9 ms on the MXU).

Semantics: zero out-of-bounds (BilinearSampler padding); slabs read from
zero-padded sources so fully/partially out-of-frame samples vanish exactly.
The interpolation stencil is the *sheared* 4-point lattice (linear interp
along the map's rows, then across rows) rather than the axis-aligned one —
both are consistent linear interpolants; they agree exactly on lattice
points and under pure translations, and differ by O(local second
difference) on smooth content plus a ~1 px boundary band
(tests/test_augment.py quantifies both).

Degenerate maps (d -> 0, rotations near 90 deg) are out of scope —
augmentation rotations are <= ~21 deg so d = s*cos(rot) stays > 0.5.
Callers pass static bounds on the pass scales and offset slopes (derived
from the augmentation config ranges; see augment/geometry.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BLOCK = 128


def _resample_axis2(img: Array, scale: Array, off: Array, out_len: int,
                    win: int, slack: int) -> Array:
    """1-D linear resample of axis 2: out[n, r, x] = img[n, r, scale_n * x +
    off[n, r]] with zero padding outside [0, L-1].

    img: (N, R, L, C); scale: (N,) in (0, scale_bound]; off: (N, R), linear
    in r per image. -> (N, R, out_len, C). ``win`` >= max(scale)*(out_len-1)
    + 2; ``slack`` >= max |off[n, r+1] - off[n, r]| * (BLOCK - 1) + 1.
    """
    n, r, length, c = img.shape
    g = min(_BLOCK, max(8, r))  # don't pad tiny line counts up to 128
    rp = -(-r // g) * g
    if rp != r:
        img = jnp.pad(img, ((0, 0), (0, rp - r), (0, 0), (0, 0)))
        # edge-pad: block minima are taken at block end rows, so pad rows
        # must continue the (linear, monotone) offset rather than inject 0
        off = jnp.pad(off, ((0, 0), (0, rp - r)), mode="edge")
    nb = rp // g
    wt = win + slack + 2            # +1 frac lerp, +1 hat support
    lp = length + 2 * wt
    imgp = jnp.pad(img, ((0, 0), (0, 0), (wt, wt), (0, 0)))

    base = jnp.floor(off)                                   # (N, RP)
    frac = (off - base)[:, :, None, None]
    baseb = base.reshape(n, nb, g)
    # off is linear in r, so the block minimum sits at an end row
    bstart = jnp.minimum(baseb[:, :, 0], baseb[:, :, -1])   # (N, NB)
    rel = jnp.clip(baseb - bstart[:, :, None], 0, slack
                   ).astype(jnp.int32).reshape(n, rp)       # (N, RP)

    # ---- per-block contiguous slab gather (lane-merged minor axis)
    ops = imgp.reshape(n * nb, g, lp * c)
    starts = jnp.clip(bstart.astype(jnp.int32) + wt, 0, lp - wt)
    starts = jnp.stack([jnp.arange(n * nb, dtype=jnp.int32),
                        starts.reshape(n * nb) * c], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 2))
    slab = jax.lax.gather(ops, starts, dn, slice_sizes=(1, g, wt * c))
    slab = slab.reshape(n, rp, wt * c)

    # ---- within-block integer residual: binary powers-of-two rolls
    k = 1
    while k <= slack:
        rolled = jnp.concatenate(
            [slab[:, :, k * c:], jnp.zeros((n, rp, k * c), slab.dtype)],
            axis=2)
        bit = ((rel & k) > 0)[:, :, None]
        slab = jnp.where(bit, rolled, slab)
        k <<= 1
    slab = slab.reshape(n, rp, wt, c)

    # ---- per-line fraction + per-image scale in ONE lerp: the remaining
    # position is u = scale*x + frac(off) with integer span {j0, j0+1, j0+2}
    # (j0 = floor(scale*x), per-image, line-independent), so three static
    # per-image takes blended with hat weights do a SINGLE bilinear lerp.
    # (A separate fraction pass followed by a scale pass would cascade two
    # lerps — that double-smooths: lerp(lerp(src, f), g) != lerp(src, f+g).)
    xs = jnp.arange(out_len, dtype=jnp.float32)
    u = scale[:, None] * xs[None, :]                        # (N, O)
    j0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, wt - 3)
    s = (u - j0)[:, None, :, None] + frac                   # (N, RP, O, 1)
    out = None
    for k in range(3):
        bk = jax.vmap(lambda sl, ix: jnp.take(sl, ix, axis=1))(
            slab, jnp.clip(j0 + k, 0, wt - 1))              # (N, RP, O, C)
        # hat weights computed in f32, applied in the slab dtype so bf16
        # inputs stay bf16 end to end (the weight cast costs ~0.4% relative
        # on image channels; label channels are sampled in f32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(s - k)).astype(slab.dtype)
        term = w * bk
        out = term if out is None else out + term
    return out[:, :r]


def affine_sample_twopass(img: Array, m: Array, t: Array, ho: int, wo: int,
                          *, sx_max: float, sy_max: float,
                          shear_max: float = 0.5) -> Array:
    """Sample ``img`` (N, H, W, C) at q = m @ p + t for output pixels
    p = (x, y), zero padding outside. ``m``: (N, 2, 2) with x-row first
    ([[dqx/dx, dqx/dy], [dqy/dx, dqy/dy]]); ``t``: (N, 2) (x, y).

    ``sx_max`` / ``sy_max``: static bounds on det(m)/m[1,1] and m[1,1] (the
    two pass scales); ``shear_max``: static bound on |m[0,1]/m[1,1]| and
    |m[1,0]| (the per-line offset slopes). Exceeding them silently clips
    sample positions — callers derive sound bounds from their transform
    parameter ranges. Both pass scales must be POSITIVE: m[1,1] > 0 and
    det(m) > 0 (rotations+positive scales qualify; flips/reflections and
    rotations beyond 90 deg do not — use the gather path for those).
    """
    n, h, w, c = img.shape
    m = m.astype(jnp.float32)
    t = t.astype(jnp.float32)
    a, b = m[:, 0, 0], m[:, 0, 1]
    cc, d = m[:, 1, 0], m[:, 1, 1]
    tx, ty = t[:, 0], t[:, 1]
    det = a * d - b * cc

    slack = int(shear_max * (_BLOCK - 1)) + 1

    # ---- X-pass over the H source rows: scale det/d, offset (b/d)v + ...
    win_x = int(sx_max * (wo - 1)) + 2
    v = jnp.arange(h, dtype=jnp.float32)
    off_x = (b / d)[:, None] * v[None, :] + (tx - b / d * ty)[:, None]
    t1 = _resample_axis2(img, det / d, off_x, wo, win_x, slack)

    # ---- Y-pass over the Wo output columns: scale d, offset c x + ty
    win_y = int(sy_max * (ho - 1)) + 2
    xs = jnp.arange(wo, dtype=jnp.float32)
    off_y = cc[:, None] * xs[None, :] + ty[:, None]
    t1t = jnp.transpose(t1, (0, 2, 1, 3))                   # (N, Wo, H, C)
    outt = _resample_axis2(t1t, d, off_y, ho, win_y, slack)
    return jnp.transpose(outt, (0, 2, 1, 3))
