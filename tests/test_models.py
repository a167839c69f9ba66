"""Model-level tests: shapes, param counts, init statistics, cascade wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu import nn
from maskflownet_tpu.models import (HEAD_SCOPE, ModelConfig, build_model,
                                    maskflownet, maskflownet_s)

H, W = 64, 128  # must be divisible by 64 (reference pipeline.py:123-124)


def _init(model, cfg=ModelConfig()):
    im = jnp.zeros((1, H, W, 3), jnp.float32)
    return nn.init(model, jax.random.PRNGKey(0), im, im, cfg)


@pytest.fixture(scope="module")
def s_params():
    return _init(maskflownet_s)


@pytest.fixture(scope="module")
def full_params():
    return _init(maskflownet)


def test_maskflownet_s_shapes(s_params):
    im1 = jnp.asarray(np.random.RandomState(0).rand(2, H, W, 3), jnp.float32)
    im2 = jnp.asarray(np.random.RandomState(1).rand(2, H, W, 3), jnp.float32)
    preds, occ, srcs = maskflownet_s(nn.apply_ctx(s_params), im1, im2)
    assert len(preds) == 5
    for i, s in enumerate((64, 32, 16, 8, 4)):
        assert preds[i].shape == (2, H // s, W // s, 2)
    assert occ[0].shape == (2, H // 4, W // 4, 1)
    assert np.all((np.asarray(occ[0]) >= 0) & (np.asarray(occ[0]) <= 1))
    c1s, c2s, flows, c30, c40 = srcs
    assert len(c1s) == len(c2s) == 6
    assert c30.shape == (2, H, W, 4) and c40.shape == (2, H, W, 4)
    # c30's 4th channel is zeros (reference MaskFlownet.py:312)
    np.testing.assert_allclose(np.asarray(c30[..., 3]), 0.0)


def test_c2s_quirk_compat():
    """strict_c2s_compat reproduces reference MaskFlownet.py:306 (image-1
    features at cascade indices 1, 2)."""
    params = _init(maskflownet_s)
    im1 = jnp.asarray(np.random.RandomState(2).rand(1, H, W, 3), jnp.float32)
    im2 = jnp.asarray(np.random.RandomState(3).rand(1, H, W, 3), jnp.float32)
    _, _, srcs = maskflownet_s(nn.apply_ctx(params), im1, im2,
                               ModelConfig(strict_c2s_compat=True))
    c1s, c2s, _, _, _ = srcs
    np.testing.assert_array_equal(np.asarray(c2s[1]), np.asarray(c1s[1]))
    np.testing.assert_array_equal(np.asarray(c2s[2]), np.asarray(c1s[2]))
    _, _, srcs2 = maskflownet_s(nn.apply_ctx(params), im1, im2,
                                ModelConfig(strict_c2s_compat=False))
    _, c2s_fixed, _, _, _ = srcs2
    assert not np.array_equal(np.asarray(c2s_fixed[1]), np.asarray(c1s[1]))


def test_maskflownet_cascade_shapes(full_params):
    im1 = jnp.asarray(np.random.RandomState(4).rand(1, H, W, 3), jnp.float32)
    im2 = jnp.asarray(np.random.RandomState(5).rand(1, H, W, 3), jnp.float32)
    preds, visuals, rest = maskflownet(nn.apply_ctx(full_params), im1, im2)
    assert len(preds) == 5
    for i, s in enumerate((64, 32, 16, 8, 4)):
        assert preds[i].shape == (1, H // s, W // s, 2)
    assert visuals[0].shape == (1, H // 4, W // 4, 1)
    assert rest == ()


def test_cascade_contains_head_params(full_params, s_params):
    head = {k for k in full_params if k.startswith(HEAD_SCOPE + "/")}
    assert {k[len(HEAD_SCOPE) + 1:] for k in head} == set(s_params)
    # stage-2 pyramid takes 4-channel input
    assert full_params["conv1x/w"].shape == (3, 3, 4, 16)


def test_param_count_matches_reference_scale(s_params, full_params):
    """MaskFlownet-S carries ~10.5M params (PWC-Net-style dense decoder
    ~8.75M + mask heads + deform convs); the full cascade roughly doubles it
    (sanity bound, not an exact parity check)."""
    n_s = sum(int(np.prod(p.shape)) for p in s_params.values())
    n_f = sum(int(np.prod(p.shape)) for p in full_params.values())
    assert 8e6 < n_s < 13e6, n_s
    assert n_f > n_s * 1.5


def test_msra_prelu_init_stats(s_params):
    w = np.asarray(s_params["conv3a/w"])  # (3,3,32,64)
    fan_avg = 9 * (32 + 64) / 2
    expect_std = np.sqrt(2.0 / (1.01 * fan_avg))
    assert abs(w.std() / expect_std - 1) < 0.1
    np.testing.assert_allclose(np.asarray(s_params["conv3a/b"]), 0.0)


def test_forward_jits_and_is_deterministic(s_params):
    fwd = jax.jit(lambda p, a, b: maskflownet_s(nn.apply_ctx(p), a, b)[0][-1])
    im1 = jnp.asarray(np.random.RandomState(6).rand(1, H, W, 3), jnp.float32)
    im2 = jnp.asarray(np.random.RandomState(7).rand(1, H, W, 3), jnp.float32)
    a = np.asarray(fwd(s_params, im1, im2))
    b = np.asarray(fwd(s_params, im1, im2))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_bf16_compute_path(s_params):
    im1 = jnp.asarray(np.random.RandomState(8).rand(1, H, W, 3), jnp.float32)
    preds, _, _ = maskflownet_s(
        nn.apply_ctx(s_params, compute_dtype=jnp.bfloat16), im1, im1)
    assert preds[-1].dtype == jnp.float32  # flow accumulators stay f32
    assert np.isfinite(np.asarray(preds[-1])).all()


def test_build_model():
    assert build_model("MaskFlownet_S") is maskflownet_s
    assert build_model("MaskFlownet") is maskflownet
    with pytest.raises(NotImplementedError):
        build_model("nope")


@pytest.mark.parametrize("s2d_cfg", [ModelConfig(s2d=True),
                                     ModelConfig(s2d=True, s2d_l2=True)],
                         ids=["l1", "l1+l2"])
def test_s2d_pyramid_parity(s_params, full_params, s2d_cfg):
    """The space-to-depth pyramid paths (cfg.s2d / cfg.s2d_l2, resolved via
    MFN_S2D / MFN_S2D_L2 at Trainer construction) are EXACT reformulations
    of the standard convs against the same stored parameters: same feature
    values at every pyramid level and same model outputs, for both the S
    model and the cascade (second 4-ch pyramid)."""
    from maskflownet_tpu.models.maskflownet import _pyramid

    rng = np.random.RandomState(7)
    im1 = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)
    im2 = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)

    def run(cfg, model, params):
        ctx = nn.apply_ctx(params)
        preds, occs, _ = model(ctx, im1, im2, cfg)
        feats = _pyramid(ctx, im1, cfg=cfg) if model is maskflownet_s \
            else None
        return preds, occs, feats

    ref_cfg = ModelConfig(s2d=False)
    p0, o0, f0 = run(ref_cfg, maskflownet_s, s_params)
    p1, o1, f1 = run(s2d_cfg, maskflownet_s, s_params)
    for a, b in zip(f0, f1):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p0[-1]), np.asarray(p1[-1]),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(o0[0]), np.asarray(o1[0]),
                               atol=5e-5)

    c0, _, _ = run(ref_cfg, maskflownet, full_params)
    c1, _, _ = run(s2d_cfg, maskflownet, full_params)
    np.testing.assert_allclose(np.asarray(c0[-1]), np.asarray(c1[-1]),
                               atol=5e-4)


@pytest.mark.parametrize("s2d_cfg", [ModelConfig(s2d=True),
                                     ModelConfig(s2d=True, s2d_l2=True)],
                         ids=["l1", "l1+l2"])
def test_s2d_gradient_parity(s_params, s2d_cfg):
    """Parameter gradients through the s2d paths match the standard path
    (the expanded-kernel construction maps wgrad back tap-for-tap)."""
    rng = np.random.RandomState(3)
    im1 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    im2 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)

    def loss(cfg):
        def f(params):
            preds, _, _ = maskflownet_s(nn.apply_ctx(params), im1, im2, cfg)
            return sum(jnp.sum(jnp.abs(p)) for p in preds)
        return f

    g0 = jax.grad(loss(ModelConfig(s2d=False)))(s_params)
    g1 = jax.grad(loss(s2d_cfg))(s_params)
    keys = ["conv1a/w", "conv1b/w", "conv1c/w", "conv2a/w", "conv1a/b"]
    if s2d_cfg.s2d_l2:
        keys += ["conv2b/w", "conv2c/w", "conv3a/w", "conv2a/b"]
    for k in keys:
        ref = np.asarray(g0[k])
        got = np.asarray(g1[k])
        np.testing.assert_allclose(
            got, ref, atol=1e-4 + 1e-3 * np.abs(ref).max(), err_msg=k)


def test_resolve_dispatch(monkeypatch):
    """Env resolution happens ONCE through resolve_dispatch (ADVICE r4:
    standard falsy set, case-insensitive), never in model code."""
    from maskflownet_tpu.models import resolve_dispatch

    monkeypatch.delenv("MFN_S2D", raising=False)
    monkeypatch.delenv("MFN_S2D_L2", raising=False)
    monkeypatch.delenv("MFN_DENSE", raising=False)
    cfg = resolve_dispatch(ModelConfig())
    assert cfg.s2d == (jax.default_backend() == "tpu")
    assert cfg.s2d_l2 is False and cfg.dense in ("pieces", "concat")
    for v in ("0", "false", "OFF", "No", ""):
        monkeypatch.setenv("MFN_S2D", v)
        assert resolve_dispatch(ModelConfig()).s2d is False, v
    for v in ("1", "true", "ON", "yes"):
        monkeypatch.setenv("MFN_S2D", v)
        assert resolve_dispatch(ModelConfig()).s2d is True, v
    # s2d_l2 requires s2d
    monkeypatch.setenv("MFN_S2D", "0")
    monkeypatch.setenv("MFN_S2D_L2", "1")
    assert resolve_dispatch(ModelConfig()).s2d_l2 is False
    monkeypatch.setenv("MFN_S2D", "1")
    assert resolve_dispatch(ModelConfig()).s2d_l2 is True
    # explicit fields win over env
    assert resolve_dispatch(ModelConfig(s2d=False)).s2d is False
    monkeypatch.setenv("MFN_DENSE", "bogus")
    with pytest.raises(ValueError):
        resolve_dispatch(ModelConfig())
    monkeypatch.setenv("MFN_DENSE", "concat")
    assert resolve_dispatch(ModelConfig()).dense == "concat"
    # the model source itself is env-free (VERDICT r4 W5 acceptance)
    # (importlib: the package attribute 'maskflownet' is the function,
    # which shadows the submodule under plain `import ... as`)
    import importlib
    import inspect
    model_mod = importlib.import_module("maskflownet_tpu.models.maskflownet")
    src = inspect.getsource(model_mod)
    body = src.split("def _use_s2d", 1)[1]
    assert "os.environ" not in body
