"""Augmentation tests: the geometric flow transform is verified by the
defining property of flow augmentation rather than against a transliterated
oracle -- warping the augmented img2 by the augmented flow must reproduce the
augmented img1 wherever the flow is valid (SURVEY.md §7 'hard parts')."""

import numpy as np

import jax
import jax.numpy as jnp

from maskflownet_tpu.augment import (ColorAugConfig, GeometryAugConfig,
                                     color_augmentation,
                                     geometry_augmentation)
from maskflownet_tpu.ops import backwarp


def _make_affine_pair(rng, oh, ow, max_disp=6.0):
    """Synthesize a consistent (img1, img2, flow) pair: img2 is img1 shifted
    by a constant flow, so ground truth is exact."""
    # smooth low-frequency image so bilinear interpolation error is tiny
    yy_, xx_ = np.mgrid[0:oh + 40, 0:ow + 40].astype(np.float32)
    base = np.zeros((oh + 40, ow + 40, 3), np.float32)
    for c in range(3):
        for _ in range(6):
            ky, kx = rng.uniform(-1 / 24, 1 / 24, 2)
            ph = rng.uniform(0, 2 * np.pi)
            base[..., c] += rng.uniform(0.05, 0.15) * np.sin(
                2 * np.pi * (ky * yy_ + kx * xx_) + ph)
    base = (base - base.min()) / (base.max() - base.min())
    dy, dx = rng.uniform(-max_disp, max_disp, 2)
    img1 = base[20:20 + oh, 20:20 + ow]
    # img1(p) corresponds to img2(p + f): img2(q) = img1(q - f) = base(q - f + 20)
    yy = np.arange(oh) + 20 - dy
    xx = np.arange(ow) + 20 - dx
    y0 = np.floor(yy).astype(int)
    x0 = np.floor(xx).astype(int)
    ay = (yy - y0)[:, None, None]
    ax = (xx - x0)[None, :, None]
    img2 = ((1 - ay) * (1 - ax) * base[y0][:, x0]
            + (1 - ay) * ax * base[y0][:, x0 + 1]
            + ay * (1 - ax) * base[y0 + 1][:, x0]
            + ay * ax * base[y0 + 1][:, x0 + 1])
    flow = np.zeros((oh, ow, 2), np.float32)
    flow[..., 0] = dy
    flow[..., 1] = dx
    return img1, img2.astype(np.float32), flow


def test_geometry_consistency_property():
    """warp(img2_aug, flow_aug) ~= img1_aug on valid, in-bounds pixels."""
    rng = np.random.RandomState(42)
    oh, ow = 96, 128
    th, tw = 64, 96
    imgs1, imgs2, flows = zip(*[_make_affine_pair(rng, oh, ow) for _ in range(4)])
    img1 = jnp.asarray(np.stack(imgs1))
    img2 = jnp.asarray(np.stack(imgs2))
    flow = jnp.asarray(np.stack(flows))
    mask = jnp.ones((4, oh, ow, 1), jnp.float32)

    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    i1a, i2a, fa, ma = geometry_augmentation(
        jax.random.PRNGKey(3), img1, img2, flow, mask, cfg)
    i1a, i2a, fa, ma = map(np.asarray, (i1a, i2a, fa, ma))
    assert i1a.shape == (4, th, tw, 3) and fa.shape == (4, th, tw, 2)

    rewarped = np.asarray(backwarp(jnp.asarray(i2a), jnp.asarray(fa)))
    # validity: mask ~ 1 and the warp target inside img2_aug bounds
    py, px = np.mgrid[0:th, 0:tw]
    ty = py[None] + fa[..., 0]
    tx = px[None] + fa[..., 1]
    inb = (ty >= 1) & (ty <= th - 2) & (tx >= 1) & (tx <= tw - 2)
    valid = (ma[..., 0] > 0.999) & inb
    # ignore a 2px frame where grid clipping makes img1_aug repeat edge pixels
    valid[:, :2] = valid[:, -2:] = valid[:, :, :2] = valid[:, :, -2:] = False
    assert valid.mean() > 0.4  # enough coverage to be meaningful
    err = np.abs(rewarped - i1a)[valid]
    assert err.mean() < 0.02, err.mean()
    assert np.quantile(err, 0.95) < 0.06


def test_geometry_shapes_and_determinism():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(2, 48, 64, 2).astype(np.float32))
    mask = jnp.ones((2, 48, 64, 1))
    cfg = GeometryAugConfig(target_shape=(32, 48), orig_shape=(48, 64))
    f = jax.jit(lambda k: geometry_augmentation(k, img, img, flow, mask, cfg))
    a = f(jax.random.PRNGKey(1))
    b = f(jax.random.PRNGKey(1))
    c = f(jax.random.PRNGKey(2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_geometry_identityish_no_rotation():
    """With angle=0, zoom=1, no translation and target==orig, the transform
    is the identity: outputs equal inputs, flow preserved."""
    rng = np.random.RandomState(1)
    img1 = jnp.asarray(rng.rand(1, 32, 40, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, 32, 40, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(1, 32, 40, 2).astype(np.float32) * 2)
    mask = jnp.ones((1, 32, 40, 1))
    cfg = GeometryAugConfig(
        angle_range=(0.0, 0.0), zoom_range=(1.0, 1.0), aspect_range=None,
        translation_range=0.0, target_shape=(32, 40), orig_shape=(32, 40),
        relative_angle=None, relative_translation=None)
    i1a, i2a, fa, ma = geometry_augmentation(
        jax.random.PRNGKey(0), img1, img2, flow, mask, cfg)
    np.testing.assert_allclose(np.asarray(i1a), np.asarray(img1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i2a), np.asarray(img2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(flow), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ma), 1.0, atol=1e-5)


def test_color_augmentation_basic():
    rng = np.random.RandomState(2)
    img1 = jnp.asarray(rng.rand(3, 24, 32, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(3, 24, 32, 3).astype(np.float32))
    cfg = ColorAugConfig()
    a1, a2 = color_augmentation(jax.random.PRNGKey(0), img1, img2, cfg)
    a1, a2 = np.asarray(a1), np.asarray(a2)
    assert a1.shape == img1.shape
    assert (a1 >= 0).all() and (a1 <= 1).all()
    assert not np.allclose(a1, np.asarray(img1))
    # deterministic in key
    b1, _ = color_augmentation(jax.random.PRNGKey(0), img1, img2, cfg)
    np.testing.assert_array_equal(a1, np.asarray(b1))


def test_color_augmentation_gamma_and_eigen():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    cfg = ColorAugConfig(gamma_range=(-0.5, 0.5), eigen_aug=True,
                         noise_range=(0.0, 0.02))
    a1, a2 = color_augmentation(jax.random.PRNGKey(5), img, img, cfg)
    assert np.isfinite(np.asarray(a1)).all()
    assert (np.asarray(a1) >= 0).all()


def test_host_geometry_consistency_property():
    """Host (numpy/cv2) geometry aug satisfies the same defining property:
    warp(img2_aug, flow_aug) ~= img1_aug on valid pixels."""
    from maskflownet_tpu.augment.host_geometry import batch_host_geometry

    rng = np.random.RandomState(7)
    oh, ow = 96, 128
    th, tw = 64, 96
    imgs1, imgs2, flows = zip(*[_make_affine_pair(rng, oh, ow) for _ in range(4)])
    img1 = np.stack(imgs1)
    img2 = np.stack(imgs2)
    flow = np.stack(flows)

    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    i1a, i2a, fa, ma = batch_host_geometry(
        np.random.RandomState(3), img1, img2, flow, None, cfg)
    assert i1a.shape == (4, th, tw, 3) and fa.shape == (4, th, tw, 2)

    rewarped = np.asarray(backwarp(jnp.asarray(i2a), jnp.asarray(fa)))
    py, px = np.mgrid[0:th, 0:tw]
    ty = py[None] + fa[..., 0]
    tx = px[None] + fa[..., 1]
    inb = (ty >= 1) & (ty <= th - 2) & (tx >= 1) & (tx <= tw - 2)
    valid = (ma[..., 0] > 0.999) & inb
    valid[:, :2] = valid[:, -2:] = valid[:, :, :2] = valid[:, :, -2:] = False
    assert valid.mean() > 0.4
    err = np.abs(rewarped - i1a)[valid]
    assert err.mean() < 0.02, err.mean()
    assert np.quantile(err, 0.95) < 0.06


def test_host_geometry_matches_device_distributions():
    """Summary statistics of host and device aug agree over many draws
    (same config, independent RNG streams): mean/std of the augmented flow
    and the fraction of valid mask."""
    from maskflownet_tpu.augment.host_geometry import batch_host_geometry

    rng = np.random.RandomState(0)
    oh, ow, th, tw = 64, 96, 48, 64
    b = 16
    img = rng.rand(b, oh, ow, 3).astype(np.float32)
    flow = np.tile(np.asarray([1.5, -2.0], np.float32), (b, oh, ow, 1))
    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))

    _, _, fa_h, ma_h = batch_host_geometry(
        np.random.RandomState(5), img, img, flow, None, cfg)
    _, _, fa_d, ma_d = geometry_augmentation(
        jax.random.PRNGKey(5), jnp.asarray(img), jnp.asarray(img),
        jnp.asarray(flow), jnp.ones((b, oh, ow, 1)), cfg)
    fa_d, ma_d = np.asarray(fa_d), np.asarray(ma_d)
    # same transform family => comparable flow magnitude statistics
    assert abs(np.mean(np.abs(fa_h)) - np.mean(np.abs(fa_d))) < 0.6, (
        np.mean(np.abs(fa_h)), np.mean(np.abs(fa_d)))
    assert abs(ma_h.mean() - ma_d.mean()) < 0.05


def test_geometry_pallas_sampler_matches_xla(monkeypatch):
    """The windowed Pallas sampler path (MFN_AUG_SAMPLER=pallas; the TPU
    default inside the jitted step) must reproduce the XLA gather path.
    Image channels are sampled in bf16 (~0.4% tolerance); mask and flow ride
    the precise (hi/lo split) channels and must match to ~1e-4 px."""
    import os
    from maskflownet_tpu.augment.geometry import geometry_augmentation

    rng = np.random.RandomState(11)
    b, oh, ow, th, tw = 2, 48, 64, 40, 48
    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    img1 = jnp.asarray(rng.rand(b, oh, ow, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(b, oh, ow, 3).astype(np.float32))
    flow = jnp.asarray((rng.randn(b, oh, ow, 2) * 3).astype(np.float32))
    mask = jnp.ones((b, oh, ow, 1), jnp.float32)
    key = jax.random.PRNGKey(4)

    monkeypatch.setenv("MFN_AUG_SAMPLER", "xla")
    ref = geometry_augmentation(key, img1, img2, flow, mask, cfg)
    monkeypatch.setenv("MFN_AUG_SAMPLER", "pallas")
    got = geometry_augmentation(key, img1, img2, flow, mask, cfg)

    for name, r, g, tol in (("img1", ref[0], got[0], 6e-3),
                            ("img2", ref[1], got[1], 6e-3),
                            ("mask", ref[3], got[3], 1e-4)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=tol,
                                   err_msg=name)
    # flow: compare where the mask is solidly interior (the renormalization
    # divides by the sampled mask, amplifying nothing where mask ~ 1)
    m = np.asarray(ref[3])[..., 0] > 0.99
    err = np.abs(np.asarray(got[2]) - np.asarray(ref[2]))[m]
    assert err.max() < 1e-3, err.max()


def test_geometry_twopass_sampler_matches_xla(monkeypatch):
    """The two-pass affine resampler path (MFN_AUG_SAMPLER=twopass; the TPU
    default) must reproduce the XLA gather path up to the documented
    differences: a ~1px boundary band (shear-direction zero leak), the
    sheared-vs-axis interpolation stencil (tiny on real content, bounded on
    noise), and the round-4 precision split -- image channels sampled in
    bf16 (ulp ~0.008 at values near 1), labels in f16. Compare on the
    interior."""
    from maskflownet_tpu.augment.geometry import geometry_augmentation

    rng = np.random.RandomState(12)
    b, oh, ow, th, tw = 2, 48, 64, 40, 48
    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    # smooth content: the stencil difference is second-order
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
    base = np.stack([np.sin(yy / 7) * np.cos(xx / 9),
                     (yy + xx) / (oh + ow),
                     np.cos(yy / 5 + xx / 8)], axis=-1)
    img1 = jnp.asarray(np.stack([base, base * 0.8 + 0.1]))
    img2 = jnp.asarray(np.stack([base * 0.9, base * 0.7 + 0.2]))
    # smooth flow: real flow fields are piecewise smooth; on white noise the
    # sheared-vs-axis stencil difference is O(local variation) by design
    flow = jnp.asarray(np.stack(
        [np.stack([np.sin(yy / 8) * 2 + xx * 0.01,
                   np.cos(xx / 9) * 1.5], axis=-1)] * b).astype(np.float32))
    mask = jnp.ones((b, oh, ow, 1), jnp.float32)
    key = jax.random.PRNGKey(9)

    monkeypatch.setenv("MFN_AUG_SAMPLER", "xla")
    ref = geometry_augmentation(key, img1, img2, flow, mask, cfg)
    monkeypatch.setenv("MFN_AUG_SAMPLER", "twopass")
    got = geometry_augmentation(key, img1, img2, flow, mask, cfg)

    sl = (slice(None), slice(2, -2), slice(2, -2))
    for name, r, g, tol in (("img1", ref[0], got[0], 2e-2),
                            ("img2", ref[1], got[1], 2e-2),
                            ("mask", ref[3], got[3], 5e-3)):
        np.testing.assert_allclose(np.asarray(g)[sl], np.asarray(r)[sl],
                                   atol=tol, err_msg=name)
    m = (np.asarray(ref[3])[..., 0] > 0.999) & (np.asarray(got[3])[..., 0] > 0.999)
    m[:, :2] = m[:, -2:] = False
    m[:, :, :2] = m[:, :, -2:] = False
    err = np.abs(np.asarray(got[2]) - np.asarray(ref[2]))[m]
    assert err.max() < 2e-2, err.max()


def test_geometry_twopass_consistency_property(monkeypatch):
    """The augmentation's own correctness property (warping img2_a by flow_a
    reproduces img1_a on valid pixels) must hold on the two-pass path too."""
    from maskflownet_tpu.augment.geometry import geometry_augmentation

    rng = np.random.RandomState(2)
    b, oh, ow, th, tw = 2, 64, 96, 48, 64
    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    # smooth-ish texture so double resampling error stays interpretable
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
    tex = np.stack([np.sin(yy / 6) * np.cos(xx / 7),
                    np.sin(yy / 11 + xx / 5),
                    (yy * xx) / (oh * ow)], axis=-1).astype(np.float32)
    img1 = jnp.asarray(np.stack([tex, tex[::-1]]))
    img2 = img1  # zero flow pair: correspondence is the identity
    flow = jnp.zeros((b, oh, ow, 2), jnp.float32)
    mask = jnp.ones((b, oh, ow, 1), jnp.float32)

    monkeypatch.setenv("MFN_AUG_SAMPLER", "twopass")
    i1a, i2a, fla, mka = geometry_augmentation(
        jax.random.PRNGKey(21), img1, img2, flow, mask, cfg)
    rewarped = backwarp(i2a, fla, clamp=False)
    m = (np.asarray(mka)[..., 0] > 0.999)
    m[:, :3] = m[:, -3:] = False
    m[:, :, :3] = m[:, :, -3:] = False
    err = np.abs(np.asarray(rewarped) - np.asarray(i1a))[m]
    assert err.mean() < 0.03, err.mean()


def test_twopass_bounds_unsound_rotation_falls_back(monkeypatch):
    """Configs whose total rotation exceeds the static-bounds soundness
    region (~69 deg incl. the relative-angle scale) must NOT use the
    two-pass sampler with clipped bounds -- _twopass_bounds returns None
    and geometry_augmentation silently takes the exact gather path,
    matching it bitwise (ADVICE r3 #1)."""
    from maskflownet_tpu.augment.geometry import (_twopass_bounds,
                                                  geometry_augmentation)

    wild = GeometryAugConfig(angle_range=(-80.0, 80.0),
                             target_shape=(40, 48), orig_shape=(48, 64))
    assert _twopass_bounds(wild) is None
    # 69/1.25 = 55.2 deg base angle scales to 69 total: just inside
    ok = GeometryAugConfig(angle_range=(-17.0, 17.0),
                           target_shape=(40, 48), orig_shape=(48, 64))
    assert _twopass_bounds(ok) is not None

    b, oh, ow = 2, 48, 64
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.rand(b, oh, ow, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(b, oh, ow, 3).astype(np.float32))
    flow = jnp.asarray((rng.randn(b, oh, ow, 2) * 2).astype(np.float32))
    mask = jnp.ones((b, oh, ow, 1), jnp.float32)
    key = jax.random.PRNGKey(4)
    monkeypatch.setenv("MFN_AUG_SAMPLER", "twopass")
    got = geometry_augmentation(key, img1, img2, flow, mask, wild)
    monkeypatch.setenv("MFN_AUG_SAMPLER", "xla")
    ref = geometry_augmentation(key, img1, img2, flow, mask, wild)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_twopass_flow_label_error_bound(monkeypatch):
    """VERDICT r3 W6 + round-4 f16 labels: bound the augmented flow LABEL
    error specifically -- through the f16 sampling of (mask, flow*mask) AND
    the mask-renormalization division -- at KITTI-scale flow magnitudes
    (~300 px), against the exact f32 gather path. Interior error must stay
    within the f16 quantization class of the wire format (engine.py ships
    flow as f16); the boundary band is excluded like the reference's valid
    masks exclude it."""
    from maskflownet_tpu.augment.geometry import geometry_augmentation

    rng = np.random.RandomState(7)
    b, oh, ow, th, tw = 2, 64, 96, 48, 64
    cfg = GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow))
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
    # smooth, large-magnitude flow: ~300 px with gentle spatial variation
    flow = np.stack([np.stack([280.0 + np.sin(yy / 9) * 30,
                               -310.0 + np.cos(xx / 11) * 25], axis=-1)] * b)
    img1 = jnp.asarray(rng.rand(b, oh, ow, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(b, oh, ow, 3).astype(np.float32))
    flow = jnp.asarray(flow.astype(np.float32))
    mask = jnp.ones((b, oh, ow, 1), jnp.float32)
    key = jax.random.PRNGKey(13)

    monkeypatch.setenv("MFN_AUG_SAMPLER", "xla")
    ref = geometry_augmentation(key, img1, img2, flow, mask, cfg)
    monkeypatch.setenv("MFN_AUG_SAMPLER", "twopass")
    got = geometry_augmentation(key, img1, img2, flow, mask, cfg)

    m = (np.asarray(ref[3])[..., 0] > 0.999) \
        & (np.asarray(got[3])[..., 0] > 0.999)
    m[:, :3] = m[:, -3:] = False
    m[:, :, :3] = m[:, :, -3:] = False
    err = np.abs(np.asarray(got[2]) - np.asarray(ref[2]))[m]
    # f16 ulp at 300 px is ~0.25; a few roundings through the two passes
    # plus the renormalization division stay within ~1 px worst-case and
    # well under the wire quantization on average
    assert err.max() < 1.0, err.max()
    assert np.median(err) < 0.15, np.median(err)
    # escape hatch: f32 labels restore the r3 (stencil-only) error class
    monkeypatch.setenv("MFN_AUG_LABEL_DTYPE", "float32")
    got32 = geometry_augmentation(key, img1, img2, flow, mask, cfg)
    err32 = np.abs(np.asarray(got32[2]) - np.asarray(ref[2]))[m]
    assert err32.max() < 0.35, err32.max()


def test_twopass_tight_bounds_sound_at_extreme_zoom(monkeypatch):
    """The round-4 clamp-aware static window bounds (geometry.py
    _twopass_bounds) must remain SOUND: at the most adversarial draws the
    derivation covers (max zoom at zero rotation -- where the crop-fit
    clamp binds least -- and max relative scale), the two-pass output must
    still match the exact gather path on the interior. An unsound bound
    would clip sample positions and black out/shift whole regions."""
    from maskflownet_tpu.augment.geometry import geometry_augmentation

    rng = np.random.RandomState(5)
    b, oh, ow, th, tw = 4, 64, 96, 48, 64
    # rotation pinned ~0, zoom pinned at its max, aspect at max: the exact
    # corner where the old config-product bound was loosest vs the new one
    cfg = GeometryAugConfig(angle_range=(-0.01, 0.01),
                            zoom_range=(1 / 0.9 - 1e-4, 1 / 0.9),
                            aspect_range=(1 / 0.9 - 1e-4, 1 / 0.9),
                            relative_scale=(1 / 0.96 - 1e-4, 1 / 0.96),
                            target_shape=(th, tw), orig_shape=(oh, ow))
    yy, xx = np.mgrid[0:oh, 0:ow].astype(np.float32)
    tex = np.stack([np.sin(yy / 5) * np.cos(xx / 6),
                    (yy + xx) / (oh + ow),
                    np.cos(yy / 7 + xx / 4)], axis=-1).astype(np.float32)
    img1 = jnp.asarray(np.stack([tex * (0.5 + 0.1 * i) for i in range(b)]))
    img2 = img1 * 0.9
    flow = jnp.asarray((rng.randn(b, oh, ow, 2) * 0.5).astype(np.float32))
    mask = jnp.ones((b, oh, ow, 1), jnp.float32)

    for seed in (0, 1, 2):
        key = jax.random.PRNGKey(seed)
        monkeypatch.setenv("MFN_AUG_SAMPLER", "xla")
        ref = geometry_augmentation(key, img1, img2, flow, mask, cfg)
        monkeypatch.setenv("MFN_AUG_SAMPLER", "twopass")
        got = geometry_augmentation(key, img1, img2, flow, mask, cfg)
        sl = (slice(None), slice(2, -2), slice(2, -2))
        for name, r, g in (("img1", ref[0], got[0]), ("img2", ref[1], got[1])):
            np.testing.assert_allclose(np.asarray(g)[sl], np.asarray(r)[sl],
                                       atol=2e-2, err_msg=f"{name}@{seed}")
