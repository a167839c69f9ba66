"""Device-side geometric augmentation (batched random affines, NHWC).

Capability parity with the reference ``GeometryAugmentation``
(``augmentation.py:229-339``): per-sample random rotation/zoom/aspect/
translation applied to the (img1, img2, flow, mask) tuple, an independent
*relative* affine + translation applied to img2 only, out-of-bounds
"force translation" correction, joint warping of [img1, mask, flow*mask]
with mask renormalization, and the induced transform of the flow *vectors*.

The parameter distributions replicate the reference exactly. The flow-vector
transform is re-derived in pixel space rather than transliterated: with
target->source pixel maps T1 (img1) and T2 (img2), correspondence
``img1(q) ~ img2(q + F(q))`` induces

    F'(p) = T2^{-1}( T1(p) + F~(p) ) - p

where ``F~`` is the flow resampled through T1 (mask-renormalized). This is
exact for any affine pair, including aspect ratios and the relative
translation (the reference handles the latter by pre-subtracting it from the
flow, ``augmentation.py:299-303``, which is algebraically the same since
sampling is linear). Correctness is property-tested: warping img2_aug by
flow_aug reproduces img1_aug on valid pixels (tests/test_augment.py).

Runs inside the jitted train step; all shapes static, PRNG threaded
explicitly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from maskflownet_tpu.ops.warp import grid_sample_normalized

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GeometryAugConfig:
    angle_range: tuple[float, float] = (-17.0, 17.0)  # degrees
    zoom_range: tuple[float, float] = (1 / 1.5, 1 / 0.9)
    aspect_range: tuple[float, float] | None = (0.9, 1 / 0.9)
    translation_range: float = 0.1
    target_shape: tuple[int, int] = (320, 448)  # (H, W)
    orig_shape: tuple[int, int] = (384, 512)
    relative_angle: float | None = 0.25
    relative_scale: tuple[float, float] = (0.96, 1 / 0.96)
    relative_translation: float | None = 0.25


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _sampler_mode() -> str:
    """Which resampler implements the two grid samplings.

    'twopass' (TPU default): the dense two-pass affine resampler
    (``ops/affine2pass.py``) — per-block slab gathers + static takes,
    ~1000x fewer gather descriptors than per-pixel formulations
    (measured at chairs b8: per-pixel gather ~57 ms, windowed Pallas
    kernel ~48 ms, round-3 two-pass 15.7 ms, round-4 two-pass ~3 ms of
    the step — G=128 blocks + bf16 images/f16 labels). 'pallas': the
    windowed MXU kernel. 'xla': per-pixel gather (always used off-TPU —
    CPU gathers are fast and exact). Override with MFN_AUG_SAMPLER.
    """
    import os

    choice = os.environ.get("MFN_AUG_SAMPLER")
    if choice in ("xla", "pallas", "twopass"):
        return choice
    return "twopass" if jax.default_backend() == "tpu" else "xla"


#: Largest total rotation (radians) for which the static two-pass bounds
#: below are sound: cos stays >= cos(1.2) ~ 0.362 so the Y-pass scale
#: d = s*cos is safely positive and the 1/cos factors are bounded.
_TWOPASS_MAX_ANGLE_RAD = 1.2


def _twopass_total_angle(cfg: "GeometryAugConfig") -> float:
    ang = max(abs(cfg.angle_range[0]), abs(cfg.angle_range[1]))
    if cfg.relative_angle is not None:
        ang *= (1.0 + cfg.relative_angle)
    return ang * math.pi / 180.0


def _twopass_bounds(
        cfg: "GeometryAugConfig") -> tuple[float, float, float] | None:
    """Static per-pass scale bounds for ``affine_sample_twopass``, or
    ``None`` when the config's total rotation exceeds the soundness region
    (the caller must then fall back to the exact gather sampler -- clamped
    bounds would silently clip sample positions and corrupt batches).

    The pixel-space linear part is [[s*a*cos, -s*a*sin], [s*sin, s*cos]]
    (normalized units cancel; s = zoom, a = aspect; the relative transform
    multiplies by rscale*R(rr) in pixel space), so the X-pass scale
    det/d = s*a/cos and the Y-pass scale d = s*cos. On top of the config
    ranges, geometry_augmentation's crop-fit clamp (the reference's
    ``augmentation.py:277-279``; geometry.py:201-202 here) caps

        s*a <= osx / (tsy*sin|rot| + tsx*cos|rot|)
        s   <= osy / (tsy*cos|rot| + tsx*sin|rot|)

    for every drawn base rotation, which tightens the static window by
    ~15% at the chairs shapes (slab bytes are the dominant aug cost --
    round-4). The bound maximizes over a rotation grid, giving the
    relative transform the worst extra rotation Ar in the 1/cos factor.
    """
    ang = _twopass_total_angle(cfg)
    if ang > _TWOPASS_MAX_ANGLE_RAD:
        return None
    z = cfg.zoom_range[1]
    a = cfg.aspect_range[1] if cfg.aspect_range else 1.0
    r = cfg.relative_scale[1] if cfg.relative_angle is not None else 1.0
    base_ang = max(abs(cfg.angle_range[0]), abs(cfg.angle_range[1])) \
        * math.pi / 180.0
    rel_ang = base_ang * cfg.relative_angle \
        if cfg.relative_angle is not None else 0.0
    th, tw = cfg.target_shape
    oh, ow = cfg.orig_shape
    osy, osx = oh - 1.0, ow - 1.0
    tsy, tsx = th - 1.0, tw - 1.0
    cos_min = math.cos(ang)
    sin_max = math.sin(ang)
    sx_max = sy_max = 0.0
    for i in range(65):
        t = base_ang * i / 64.0
        ct, st = math.cos(t), math.sin(t)
        c_tot = max(math.cos(min(t + rel_ang, ang)), 0.3)
        sa = min(z * a, osx / (tsy * st + tsx * ct))      # crop-fit clamp 1
        s = min(z, osy / (tsy * ct + tsx * st))           # crop-fit clamp 2
        sx_max = max(sx_max, sa / c_tot)
        sy_max = max(sy_max, s)                           # d = s*cos <= s
    sx_max *= r * 1.02
    sy_max *= r * 1.02
    # offset slopes: |b/d| = aspect*tan(rot) (X-pass), |c| = s*sin (Y-pass)
    shear_max = max(a * sin_max / max(cos_min, 0.3), z * r * sin_max) * 1.05
    return sx_max, sy_max, max(shear_max, 0.05)


def _pick_sampler(cfg: "GeometryAugConfig", orig: tuple[int, int],
                  target: tuple[int, int]):
    """TPU path: the windowed Pallas sampler (``ops/pallas/affine.py``),
    with a *sound* static per-tile source-window bound derived from the
    config's transform ranges. The generic gather path costs ~57 ms of the
    chairs train step at batch 8 (full-res f32 gathers are descriptor-bound
    on TPU); the windowed MXU kernel samples the same maps in ~its HBM time.

    Window-bound derivation: in pixel space the sampling map's linear part
    is exactly ``[[s*a*cos, -s*a*sin], [s*sin, s*cos]]`` (the normalized
    units cancel against the grid denormalization; s = zoom, a = aspect,
    times the relative scale for img2), so over an output tile of (T, U)
    the source coordinates spread at most ``B*(sin_max*U + T)`` rows and
    ``B*(U + sin_max*T)`` cols with ``B = zoom_max * aspect_max *
    rel_scale_max``. The force-translation clip only shrinks the spread.

    Returns a sampler(img, gx, gy, precise_ch) or None (non-TPU backend,
    incompatible tile divisibility, or MFN_AUG_SAMPLER=xla).
    """
    import math as _math
    import os

    choice = os.environ.get("MFN_AUG_SAMPLER")
    if choice == "xla":
        return None
    if choice != "pallas" and jax.default_backend() != "tpu":
        return None
    th, tw = target
    oh, ow = orig
    if th % 8:
        return None
    u_cols = next((d for d in range(64, 15, -1) if tw % d == 0), None)
    if u_cols is None:
        return None

    b_lin = cfg.zoom_range[1] \
        * (cfg.aspect_range[1] if cfg.aspect_range else 1.0) \
        * (cfg.relative_scale[1] if cfg.relative_angle is not None else 1.0)
    ang = abs(cfg.angle_range[0]) + abs(cfg.angle_range[1])
    if cfg.relative_angle is not None:
        ang *= (1.0 + cfg.relative_angle)
    sin_max = min(1.0, _math.sin(min(ang * _math.pi / 180.0, _math.pi / 2)))
    t_rows = 8
    win_y = int(_math.ceil(b_lin * (sin_max * u_cols + t_rows))) + 4
    win_x = int(_math.ceil(b_lin * (u_cols + sin_max * t_rows))) + 4

    from maskflownet_tpu.ops.pallas.affine import windowed_sample

    interpret = jax.default_backend() != "tpu"  # MFN_AUG_SAMPLER=pallas on CPU

    def sampler(img, gx, gy, precise_ch):
        h, w = img.shape[1], img.shape[2]
        sy = (gy + 1.0) * ((h - 1) / 2.0)
        sx = (gx + 1.0) * ((w - 1) / 2.0)
        return windowed_sample(img, sy, sx, window=(win_y, win_x),
                               tile=(t_rows, u_cols),
                               precise_ch=precise_ch, interpret=interpret)

    return sampler


def geometry_augmentation(key: Array, img1: Array, img2: Array, flow: Array,
                          mask: Array, cfg: GeometryAugConfig,
                          image_dtype=None):
    """img1/img2: (B, oh, ow, 3); flow: (B, oh, ow, 2) (dy, dx) source px;
    mask: (B, oh, ow, 1) in [0,1] (or broadcastable). Returns the augmented
    tuple at ``cfg.target_shape`` resolution.

    ``image_dtype``: dtype of the returned *images* (flow/mask stay f32).
    Defaults to f32; the training engine passes its compute dtype (bf16) so
    the whole post-aug image chain (color aug, centralize, model input)
    runs half-width with no round trip through f32 (round 4)."""
    b, oh, ow, _ = img1.shape
    th, tw = cfg.target_shape
    assert (oh, ow) == tuple(cfg.orig_shape), (img1.shape, cfg.orig_shape)

    ks = jax.random.split(key, 10)
    deg = math.pi / 180.0

    # ---- base transform parameters (distributions: augmentation.py:272-285)
    rot = _uniform(ks[0], cfg.angle_range[0] * deg, cfg.angle_range[1] * deg, (b,))
    if cfg.aspect_range is not None:
        aspect = _uniform(ks[1], *cfg.aspect_range, (b,))
    else:
        aspect = jnp.ones((b,), jnp.float32)
    scale = _uniform(ks[2], *cfg.zoom_range, (b,))
    osy, osx = oh - 1.0, ow - 1.0
    tsy, tsx = th - 1.0, tw - 1.0
    ar = jnp.abs(rot)
    # clamp so the rotated crop fits inside the source (augmentation.py:277-279)
    scale = jnp.minimum(scale, osx / (aspect * (tsy * jnp.sin(ar) + tsx * jnp.cos(ar))))
    scale = jnp.minimum(scale, osy / (tsy * jnp.cos(ar) + tsx * jnp.sin(ar)))

    unit_xx = tsx / osx
    unit_yx = tsy / osx  # row-in-target per col-in-source coupling units
    unit_xy = tsx / osy
    unit_yy = tsy / osy
    pad_x = 1 - scale * unit_xx
    pad_y = 1 - scale * unit_yy
    tr2 = (-2 * cfg.translation_range, 2 * cfg.translation_range)
    tx = _uniform(ks[3], -1, 1, (b,)) * pad_x + _uniform(ks[4], *tr2, (b,))
    ty = _uniform(ks[5], -1, 1, (b,)) * pad_y + _uniform(ks[6], *tr2, (b,))

    # normalized-coords affine rows [a, b, tx, c, d, ty] (augmentation.py:283-285)
    a1 = jnp.stack([
        scale * aspect * jnp.cos(rot) * unit_xx,
        scale * aspect * (-jnp.sin(rot)) * unit_yx,
        tx,
        scale * jnp.sin(rot) * unit_xy,
        scale * jnp.cos(rot) * unit_yy,
        ty,
    ], axis=1)

    # ---- relative transform for img2 (augmentation.py:253-269)
    if cfg.relative_angle is not None:
        rel_rng = (cfg.angle_range[0] * deg * cfg.relative_angle,
                   cfg.angle_range[1] * deg * cfg.relative_angle)
        rrot = _uniform(ks[7], *rel_rng, (b,))
        rscale = _uniform(ks[8], *cfg.relative_scale, (b,))
    else:
        rrot = jnp.zeros((b,), jnp.float32)
        rscale = jnp.ones((b,), jnp.float32)
    arel = tsy / tsx  # target aspect (augmentation.py:254)
    # a2 = a1 (2x3) @ rel (3x3)
    rel = jnp.stack([
        rscale * jnp.cos(rrot), rscale * (-jnp.sin(rrot)) * arel, jnp.zeros((b,)),
        rscale * jnp.sin(rrot) / arel, rscale * jnp.cos(rrot), jnp.zeros((b,)),
        jnp.zeros((b,)), jnp.zeros((b,)), jnp.ones((b,)),
    ], axis=1).reshape(b, 3, 3)
    a2 = jnp.einsum("bij,bjk->bik", a1.reshape(b, 2, 3), rel).reshape(b, 6)

    if cfg.relative_translation is not None:
        rt = 2 * cfg.translation_range * cfg.relative_translation
        rel_t = _uniform(ks[9], -rt, rt, (b, 2))  # normalized (x, y)
    else:
        rel_t = jnp.zeros((b, 2), jnp.float32)

    # ---- grids + force-translation correction (augmentation.py:306-309)
    def make_grid(theta):
        ys = jnp.linspace(-1.0, 1.0, th)
        xs = jnp.linspace(-1.0, 1.0, tw)
        y_t, x_t = jnp.meshgrid(ys, xs, indexing="ij")
        gx = theta[:, 0, None, None] * x_t + theta[:, 1, None, None] * y_t + theta[:, 2, None, None]
        gy = theta[:, 3, None, None] * x_t + theta[:, 4, None, None] * y_t + theta[:, 5, None, None]
        return gx, gy

    g1x, g1y = make_grid(a1)
    ftx = (jnp.maximum(g1x.max(axis=(1, 2)) - 1, 0)
           + jnp.minimum(g1x.min(axis=(1, 2)) + 1, 0))
    fty = (jnp.maximum(g1y.max(axis=(1, 2)) - 1, 0)
           + jnp.minimum(g1y.min(axis=(1, 2)) + 1, 0))
    g1x = jnp.clip(g1x - ftx[:, None, None], -1, 1)
    g1y = jnp.clip(g1y - fty[:, None, None], -1, 1)

    g2x, g2y = make_grid(a2)
    g2x = g2x - ftx[:, None, None] + rel_t[:, 0, None, None]
    g2y = g2y - fty[:, None, None] + rel_t[:, 1, None, None]

    # ---- pixel-space maps of the sampling grids (x, y) order; used both
    # for the two-pass sampler and for the flow-vector transform below
    cx_t, cy_t = tsx / 2.0, tsy / 2.0
    cx_o, cy_o = osx / 2.0, osy / 2.0

    def to_pixel(theta, add_ftx, add_fty, add_rel):
        # p_norm = ((px - cx)/cx, (py - cy)/cy); q_px = (g + 1) * c_o
        m = theta.reshape(b, 2, 3)
        lin = m[:, :, :2]  # rows: (gx; gy) from (x_t, y_t)
        t_n = m[:, :, 2]
        t_n = t_n - jnp.stack([add_ftx, add_fty], axis=1)
        if add_rel:
            t_n = t_n + rel_t
        d_t = jnp.asarray([[1.0 / cx_t, 0.0], [0.0, 1.0 / cy_t]])
        d_o = jnp.stack([lin[:, 0] * cx_o, lin[:, 1] * cy_o], axis=1)  # rows scaled
        m_px = jnp.einsum("bij,jk->bik", d_o, d_t)
        # q = m_px @ (p - c_t) + (t_n + 1) * c_o
        t_px = (t_n + 1.0) * jnp.asarray([cx_o, cy_o])
        # fold center: q = m_px @ p + (t_px - m_px @ c_t)
        c_t = jnp.asarray([cx_t, cy_t])
        t_full = t_px - jnp.einsum("bij,j->bi", m_px, c_t)
        return m_px, t_full

    m1, t1 = to_pixel(a1, ftx, fty, False)
    m2, t2 = to_pixel(a2, ftx, fty, True)

    # ---- joint sampling of img1 / mask / flow*mask (augmentation.py:305-314)
    mask_b = jnp.broadcast_to(mask.astype(jnp.float32), flow.shape[:3] + (1,))
    mode = _sampler_mode()
    bounds = _twopass_bounds(cfg) if mode == "twopass" else None
    if mode == "twopass" and bounds is None:
        # rotation range outside the static-bounds soundness region
        # (> ~69 deg total): the exact gather path instead of silently
        # clipping sample positions (ADVICE r3)
        mode = "xla"
    if mode == "twopass":
        from maskflownet_tpu.ops.affine2pass import affine_sample_twopass
        sx_max, sy_max, shear_max = bounds
        # Precision split (round 4): image channels ride bf16 (~0.4%
        # relative -- below the color-aug noise floor and the model's own
        # bf16 compute); labels (mask, flow*mask) ride f16 unless
        # MFN_AUG_LABEL_DTYPE=float32 -- the flow already crosses the wire
        # as f16 (engine.py), so f16 sampling adds roundings of the same
        # quantization class (<= ~0.2 px at a 400 px KITTI flow, ~0.006 px
        # at typical magnitudes; tests/test_augment.py bounds the label
        # error). Halving the sampled bytes matters because the slab
        # gathers are bandwidth/descriptor-bound (ops/affine2pass.py):
        # 15.7 ms (r3, all-f32) -> ~4.5 ms for the two calls.
        import os
        lab_dtype = jnp.float32 if os.environ.get(
            "MFN_AUG_LABEL_DTYPE") == "float32" else jnp.float16
        imgs = jnp.concatenate([img1, img2], axis=0).astype(jnp.bfloat16)
        imgs_a = affine_sample_twopass(
            imgs, jnp.concatenate([m1, m2], axis=0),
            jnp.concatenate([t1, t2], axis=0), th, tw, sx_max=sx_max,
            sy_max=sy_max, shear_max=shear_max)
        out_dt = image_dtype or jnp.float32
        img1_a = imgs_a[:b].astype(out_dt)
        img2_a = imgs_a[b:].astype(out_dt)
        lab = jnp.concatenate(
            [mask_b, flow.astype(jnp.float32) * mask_b],
            axis=-1).astype(lab_dtype)
        lab_a = affine_sample_twopass(lab, m1, t1, th, tw, sx_max=sx_max,
                                      sy_max=sy_max, shear_max=shear_max
                                      ).astype(jnp.float32)
        mask_a = lab_a[..., 0:1]
        flow_s = lab_a[..., 1:3] / jnp.maximum(mask_a, 1e-8)  # (dy, dx)
    else:
        packed = jnp.concatenate(
            [img1, mask_b, flow.astype(jnp.float32) * mask_b], axis=-1)
        sampler = _pick_sampler(cfg, (oh, ow), (th, tw)) \
            if mode == "pallas" else None
        if sampler is not None:
            packed = sampler(packed, g1x, g1y, precise_ch=3)
            img2_a = sampler(img2, g2x, g2y, precise_ch=0)
        else:
            packed = grid_sample_normalized(packed, g1x, g1y)
            img2_a = grid_sample_normalized(img2, g2x, g2y)
        out_dt = image_dtype or jnp.float32
        img1_a = packed[..., 0:3].astype(out_dt)
        img2_a = img2_a.astype(out_dt)
        mask_a = packed[..., 3:4]
        flow_s = packed[..., 4:6] / jnp.maximum(mask_a, 1e-8)  # (dy, dx)

    # ---- induced flow-vector transform: F'(p) = T2^-1(T1 p + F~) - p ----

    det = m2[:, 0, 0] * m2[:, 1, 1] - m2[:, 0, 1] * m2[:, 1, 0]
    inv2 = jnp.stack([
        jnp.stack([m2[:, 1, 1], -m2[:, 0, 1]], axis=1),
        jnp.stack([-m2[:, 1, 0], m2[:, 0, 0]], axis=1),
    ], axis=1) / det[:, None, None]

    py = jax.lax.broadcasted_iota(jnp.float32, (1, th, tw), 1)
    px = jax.lax.broadcasted_iota(jnp.float32, (1, th, tw), 2)
    p = jnp.stack([px + jnp.zeros((b, 1, 1)), py + jnp.zeros((b, 1, 1))], axis=-1)  # (b,th,tw,2) xy
    f_xy = jnp.stack([flow_s[..., 1], flow_s[..., 0]], axis=-1)
    q = (jnp.einsum("bij,bhwj->bhwi", m1, p) + t1[:, None, None, :] + f_xy)
    newp = jnp.einsum("bij,bhwj->bhwi", inv2, q - t2[:, None, None, :])
    f_new_xy = newp - p
    flow_a = jnp.stack([f_new_xy[..., 1], f_new_xy[..., 0]], axis=-1)  # (dy, dx)

    return img1_a, img2_a, flow_a, mask_a
