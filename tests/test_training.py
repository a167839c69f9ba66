"""Training-engine tests: LR schedule semantics, loss decrease on the
8-device CPU mesh, checkpoint save/load/resume, frozen-head cascade,
validate/predict paths, losses."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu.augment import ColorAugConfig, GeometryAugConfig
from maskflownet_tpu.losses import (epe_loss, epe_loss_with_mask,
                                    kitti_outlier_rate, multiscale_epe)
from maskflownet_tpu.models import HEAD_SCOPE, ModelConfig
from maskflownet_tpu.parallel import make_mesh
from maskflownet_tpu.training import Trainer, TrainSettings, lr_at_step

TH, TW = 64, 128
OH, OW = 96, 160


def _settings(**kw):
    base = dict(
        model="MaskFlownet_S",
        model_cfg=ModelConfig(),
        compute_dtype="float32",
        target_shape=(TH, TW),
        orig_shape=(OH, OW),
        geo=GeometryAugConfig(target_shape=(TH, TW), orig_shape=(OH, OW)),
        color=ColorAugConfig(noise_range=(0, 0.02)),
    )
    base.update(kw)
    return TrainSettings(**base)


def _batch(b=8, seed=0):
    rng = np.random.RandomState(seed)
    img1 = rng.randint(0, 255, (b, OH, OW, 3)).astype(np.uint8)
    img2 = rng.randint(0, 255, (b, OH, OW, 3)).astype(np.uint8)
    flow = (rng.randn(b, OH, OW, 2) * 2).astype(np.float32)
    return img1, img2, flow


# ---------------------------------------------------------------------------
# schedule
# ---------------------------------------------------------------------------

def test_lr_schedule_reference_semantics():
    sched = [[400000, 1e-4], [600000, 5e-5], [800000, 2.5e-5]]
    assert lr_at_step(sched, 1) == 1e-4
    assert lr_at_step(sched, 400000) == 1e-4  # boundary inclusive
    assert lr_at_step(sched, 400001) == 5e-5
    assert lr_at_step(sched, 800000) == 2.5e-5
    assert lr_at_step(sched, 800001) is None  # schedule exhausted -> stop


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_epe_losses():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    label = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    mask = jnp.ones((2, 8, 8, 1))
    e = np.asarray(epe_loss(pred, label))
    want = np.linalg.norm(np.asarray(pred - label), axis=-1).mean((1, 2))
    np.testing.assert_allclose(e, want, rtol=1e-5)
    # masked == unmasked with all-ones mask (up to eps)
    em = np.asarray(epe_loss_with_mask(pred, label, mask))
    np.testing.assert_allclose(em, want, rtol=1e-3)
    # q-norm variant
    eq = np.asarray(epe_loss_with_mask(pred, label, mask, q=0.4))
    want_q = ((np.abs(np.asarray(pred - label)).sum(-1) + 1e-8) ** 0.4).mean((1, 2))
    np.testing.assert_allclose(eq, want_q, rtol=1e-4)
    # half mask halves the denominator
    m2 = mask.at[:, :4].set(0.0)
    e2 = np.asarray(epe_loss_with_mask(pred, label, m2))
    d = np.linalg.norm(np.asarray(pred - label), axis=-1)
    np.testing.assert_allclose(e2, (d * np.asarray(m2)[..., 0]).sum((1, 2))
                               / np.asarray(m2)[..., 0].sum((1, 2)), rtol=1e-3)


def test_multiscale_epe_weighting():
    rng = np.random.RandomState(1)
    flow = jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32))
    mask = jnp.ones((1, 64, 64, 1))
    preds = [jnp.zeros((1, 64 // s, 64 // s, 2)) for s in (64, 32, 16, 8, 4)]
    total = np.asarray(multiscale_epe(flow, mask, preds))
    # zero preds: each scale term is epe(0, flow) == |flow| mean; upsampled
    # zeros stay zero, so each term is the same base EPE
    base = np.linalg.norm(np.asarray(flow), axis=-1).mean()
    np.testing.assert_allclose(total, base * (0.005 + 0.01 + 0.02 + 0.08 + 0.32),
                               rtol=1e-4)


def test_kitti_outlier_rate():
    label = jnp.zeros((1, 4, 4, 2)).at[..., 0].set(10.0)
    pred = label.at[0, 0, 0, 0].add(5.0)  # err 5 > 3 and 50% > 5%
    mask = jnp.ones((1, 4, 4, 1))
    r = float(kitti_outlier_rate(pred, label, mask)[0])
    assert abs(r - 1 / 16) < 1e-6


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trainer():
    assert jax.device_count() == 8, "tests expect the virtual 8-CPU mesh"
    return Trainer(_settings(), mesh=make_mesh())


@pytest.mark.slow
def test_train_loss_decreases_on_mesh():
    """Deterministic descent on a fixed batch (augmentation disabled so the
    target is constant across steps)."""
    tr = Trainer(_settings(geo=None, color=None,
                           target_shape=(TH, TW), orig_shape=(TH, TW)),
                 mesh=make_mesh())
    rng = np.random.RandomState(0)
    b = 8
    img1 = rng.randint(0, 255, (b, TH, TW, 3)).astype(np.uint8)
    img2 = rng.randint(0, 255, (b, TH, TW, 3)).astype(np.uint8)
    flow = (rng.randn(b, TH, TW, 2) * 2).astype(np.float32)
    losses = []
    for i in range(10):
        m = tr.train_batch(img1, img2, flow, lr=5e-5)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:2]), losses


@pytest.mark.slow
def test_validate_and_predict(trainer):
    rng = np.random.RandomState(3)
    img1s = [rng.randint(0, 255, (70, 90, 3), dtype=np.uint8) for _ in range(3)]
    img2s = [rng.randint(0, 255, (70, 90, 3), dtype=np.uint8) for _ in range(3)]
    flows = [rng.randn(70, 90, 2).astype(np.float32) for _ in range(3)]
    epe = trainer.validate(img1s, img2s, flows, batch_size=2)
    assert np.isfinite(epe) and epe > 0
    fl_all = trainer.validate(img1s, img2s, flows, batch_size=2,
                              return_type="kitti")
    assert 0 <= fl_all <= 1
    # "both" returns the identical pair from ONE inference sweep (r3 W7)
    calls = []
    orig = trainer.do_batch
    trainer.do_batch = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        epe_b, fl_b = trainer.validate(img1s, img2s, flows, batch_size=2,
                                       return_type="both")
    finally:
        trainer.do_batch = orig
    assert len(calls) == 2          # ceil(3/2) batches, one pass total
    assert epe_b == pytest.approx(epe) and fl_b == pytest.approx(fl_all)
    outs = list(trainer.predict(img1s, img2s, batch_size=2))
    assert len(outs) == 3
    flow, occ, warped = outs[0]
    assert flow.shape == (70, 90, 2)
    assert occ.shape == (70, 90, 1)
    assert warped.shape == (70, 90, 3)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, trainer):
    prefix = str(tmp_path / "ck")
    step_before = trainer.steps
    trainer.save(prefix)
    t2 = Trainer(_settings(), mesh=make_mesh(), seed=123)
    t2.load(prefix + ".npz")
    assert t2.steps == step_before
    for k in trainer.params:
        np.testing.assert_array_equal(np.asarray(trainer.params[k]),
                                      np.asarray(t2.params[k]))
    mu_a = trainer._opt_flat()[0]
    mu_b = t2._opt_flat()[0]
    np.testing.assert_array_equal(np.asarray(mu_a["conv1a/w"]),
                                  np.asarray(mu_b["conv1a/w"]))


@pytest.mark.xslow
def test_cascade_frozen_head_training():
    """fix_head: head params must not move; stage-2 params must move."""
    s = _settings(model="MaskFlownet", fix_head=True, q=0.4)
    tr = Trainer(s, mesh=make_mesh())
    head_key = HEAD_SCOPE + "/conv1a/w"
    tail_key = "conv1x/w"
    head_before = np.asarray(tr.params[head_key]).copy()
    tail_before = np.asarray(tr.params[tail_key]).copy()
    img1, img2, flow = _batch()
    for _ in range(2):
        m = tr.train_batch(img1, img2, flow, lr=1e-3)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_array_equal(np.asarray(tr.params[head_key]), head_before)
    assert np.abs(np.asarray(tr.params[tail_key]) - tail_before).max() > 0


@pytest.mark.slow
def test_load_head_bootstraps_cascade(tmp_path):
    """Standalone S checkpoint -> cascade head scope (reference
    main.py:129-139 flow)."""
    ts = Trainer(_settings(), mesh=make_mesh(), seed=7)
    prefix = str(tmp_path / "s_ck")
    ts.save(prefix)
    tc = Trainer(_settings(model="MaskFlownet", fix_head=True),
                 mesh=make_mesh(), seed=8)
    tc.load_head(prefix + ".npz")
    np.testing.assert_array_equal(
        np.asarray(tc.params[HEAD_SCOPE + "/conv1a/w"]),
        np.asarray(ts.params["conv1a/w"]))

    # checkpoint hygiene, both directions (VERDICT r3 W5): a cascade
    # checkpoint stores head params under the MaskFlownet_S/ prefix, so
    # loading it into an S model trips the missing-params check; an S
    # checkpoint only seeds a cascade through load_head, never load().
    casc_prefix = str(tmp_path / "casc_ck")
    tc.save(casc_prefix)
    with pytest.raises(ValueError, match="missing params"):
        ts.load(casc_prefix + ".npz")
    with pytest.raises(ValueError, match="missing params"):
        tc.load(prefix + ".npz")
    # the silent-superset hole W5 actually describes: a checkpoint that
    # covers the model AND carries extra keys must be rejected, not
    # wholesale-installed
    z = dict(np.load(prefix + ".npz"))
    z["p:bogus/w"] = np.zeros((3, 3), np.float32)
    np.savez(str(tmp_path / "superset"), **z)
    with pytest.raises(ValueError, match="unknown to model"):
        ts.load(str(tmp_path / "superset.npz"))
    # load_head in turn must refuse a checkpoint not covering the head
    z = dict(np.load(prefix + ".npz"))
    z.pop("p:conv1a/w")
    np.savez(str(tmp_path / "partial"), **z)
    with pytest.raises(ValueError, match="does not cover the head"):
        tc.load_head(str(tmp_path / "partial.npz"))


@pytest.mark.slow
def test_load_rejects_bad_schema_and_shapes(tmp_path, trainer):
    prefix = str(tmp_path / "ck")
    trainer.save(prefix)
    z = dict(np.load(prefix + ".npz"))
    assert int(z["schema"]) == Trainer.CKPT_SCHEMA
    # future schema version -> refuse (don't misparse a newer layout)
    z2 = dict(z, schema=np.asarray(Trainer.CKPT_SCHEMA + 1))
    np.savez(str(tmp_path / "future"), **z2)
    with pytest.raises(ValueError, match="schema"):
        trainer.load(str(tmp_path / "future.npz"))
    # pre-round-4 checkpoints lack the marker: accepted as current schema
    z3 = {k: v for k, v in z.items() if k != "schema"}
    np.savez(str(tmp_path / "legacy"), **z3)
    trainer.load(str(tmp_path / "legacy.npz"))
    # per-param shape mismatch -> refuse
    z4 = dict(z)
    z4["p:conv1a/w"] = z4["p:conv1a/w"][..., :1]
    np.savez(str(tmp_path / "badshape"), **z4)
    with pytest.raises(ValueError, match="shape"):
        trainer.load(str(tmp_path / "badshape.npz"))


@pytest.mark.slow
def test_train_batch_with_mask(trainer):
    img1, img2, flow = _batch(seed=5)
    mask = np.full((8, OH, OW, 1), 255, np.uint8)
    mask[:, :10] = 0
    m = trainer.train_batch(img1, img2, flow, mask, lr=1e-4)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["epe"]))


def test_infer_bucket_guard_warns():
    """The inference shape-bucket cache warns once it holds 8 compiled
    programs and a new (shape, resize) bucket arrives (W6): per-frame native
    shapes would otherwise silently recompile per image."""
    import warnings

    tr = Trainer(_settings(geo=None, color=None,
                           target_shape=(64, 64), orig_shape=(64, 64)),
                 mesh=make_mesh())
    # _infer_fn only *builds* the jitted callable (tracing/compilation is
    # lazy on first call), so filling buckets is cheap
    for i in range(8):
        tr._infer_fn((64 + i, 64), None)
    assert len(tr._infer_cache) == 8
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tr._infer_fn((200, 64), None)
    assert any("shape-bucket" in str(w.message) for w in caught), \
        [str(w.message) for w in caught]


@pytest.mark.slow
def test_mixed_shape_validation_two_buckets(trainer):
    """A mixed Sintel+KITTI-style validation pass (two native shapes, as the
    reference validates 436x1024 Sintel then 370x1224 KITTI, main.py:163-184)
    compiles exactly one program per dataset shape -- no silent per-image
    recompiles -- and each dataset's outputs come back at its own native
    resolution with the x64 working-resolution round trip applied."""
    rng = np.random.RandomState(5)
    before = len(trainer._infer_cache)

    def fake(shape, n):
        i1 = [rng.randint(0, 255, shape + (3,), dtype=np.uint8) for _ in range(n)]
        i2 = [rng.randint(0, 255, shape + (3,), dtype=np.uint8) for _ in range(n)]
        fl = [rng.randn(*shape, 2).astype(np.float32) for _ in range(n)]
        return i1, i2, fl

    s1, s2 = (70, 90), (54, 120)     # stand-ins for 436x1024 / 370x1224
    for shape in (s1, s2):
        i1, i2, fl = fake(shape, 3)
        epe = trainer.validate(i1, i2, fl, batch_size=2)
        assert np.isfinite(epe) and epe > 0
        flow, occ, warped = next(trainer.predict(i1, i2, batch_size=2))
        assert flow.shape == shape + (2,)
    # one bucket per dataset shape (predict/validate share buckets)
    new = len(trainer._infer_cache) - before
    assert new <= 2, trainer._infer_cache.keys()


def test_device_prefetcher_roundtrip_and_leak_watchdog():
    """DevicePrefetcher delivers transformed batches in order, and its
    host-RSS watchdog (the tunneled-backend transfer-leak rail; see
    parallel/mesh.py docstring) fires exactly once when memory growth
    tracks cumulative transferred bytes, and never below the 4 GB floor."""
    import warnings

    from maskflownet_tpu.parallel import DevicePrefetcher
    from maskflownet_tpu.parallel import mesh as mesh_mod

    batches = [tuple(np.full((2, 4, 4, 3), i, np.float32) for _ in range(2))
               for i in range(3)]
    it = iter(batches + [None])
    pf = DevicePrefetcher(lambda: next(it), make_mesh(), depth=2)
    for i in range(3):
        got = pf.get()
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      batches[i][0])
    assert pf.get() is None
    assert pf._bytes_sent == sum(
        sum(x.nbytes for x in b) for b in batches)
    pf.stop()

    # below the 4 GB transfer floor: silent even if RSS exploded
    pf._rss0, pf._bytes_sent = 0, (1 << 30)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pf._check_leak()

    # past the floor with RSS tracking transfers: warn once, then stay quiet
    pf._bytes_sent = 5 << 30
    real_rss = mesh_mod._rss_bytes
    mesh_mod._rss_bytes = lambda: 5 << 30
    try:
        with pytest.warns(UserWarning, match="retain every host->device"):
            pf._check_leak()
        assert pf._leak_warned
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pf._check_leak()
    finally:
        mesh_mod._rss_bytes = real_rss
