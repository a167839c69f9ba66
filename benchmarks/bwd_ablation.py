"""Apportion the MaskFlownet-S BACKWARD pass (VERDICT r3 #3b): the train
step spends ~24 ms in backward+Adam vs 13.7 ms forward (PERF.md), and the
backward had never been decomposed the way ``fwd_ablation.py`` decomposes
the forward. Same monkeypatch method, but timing ``value_and_grad`` of the
train loss; each fake removes an op's forward AND its VJP.

Also A/Bs two structural levers that only matter in reverse mode:
  * remat of the feature pyramid (recompute 36 convs in the backward
    instead of storing their activations -- trades FLOPs for HBM)
  * the multiscale loss match mode

Run: ``python benchmarks/bwd_ablation.py``
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from maskflownet_tpu import nn
from maskflownet_tpu.losses import multiscale_epe
from maskflownet_tpu.models import ModelConfig, build_model
import importlib
mfn_mod = importlib.import_module("maskflownet_tpu.models.maskflownet")
import maskflownet_tpu.ops.deform as deform_mod

TH, TW, B = 320, 448, 8
WEIGHTS = (0.005, 0.01, 0.02, 0.08, 0.32)


def fake_correlation(f1, f2, md, **kw):
    c = (2 * md + 1) ** 2
    return jnp.broadcast_to(jnp.mean(f1 + f2, axis=-1, keepdims=True),
                            f1.shape[:3] + (c,))


def fake_deform(x, flow, weight, bias=None, method="auto", **kw):
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return out + bias if bias is not None else out


def timed(step, args, iters=20):
    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def build(model_fn, match="upsampling", fwd_only=False):
    def loss_fn(params, i1, i2, flow, mask):
        ctx = nn.apply_ctx(params, compute_dtype=jnp.bfloat16)
        preds, occs, _ = model_fn(ctx, i1, i2, ModelConfig())
        return jnp.mean(multiscale_epe(flow, mask, preds, weights=WEIGHTS,
                                       match=match))

    if fwd_only:
        return jax.jit(loss_fn)
    return jax.jit(jax.value_and_grad(loss_fn))


def main():
    model_fn = build_model("MaskFlownet_S")
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(B, TH, TW, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, TH, TW, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(B, TH, TW, 2).astype(np.float32))
    mask = jnp.ones((B, TH, TW, 1), jnp.float32)
    params = nn.init(model_fn, jax.random.PRNGKey(0), img1[:1], img2[:1],
                     ModelConfig())
    args = (params, img1, img2, flow, mask)

    real_corr = mfn_mod.correlation
    real_deform = deform_mod.flow_guided_deform_conv3x3

    results = {}
    results["fwd only (loss, no grad)"] = timed(build(model_fn, fwd_only=True), args)
    results["baseline fwd+bwd"] = timed(build(model_fn), args)

    mfn_mod.correlation = fake_correlation
    results["corr -> fake"] = timed(build(model_fn), args)
    mfn_mod.correlation = real_corr

    deform_mod.flow_guided_deform_conv3x3 = fake_deform
    results["deform -> plain conv"] = timed(build(model_fn), args)
    deform_mod.flow_guided_deform_conv3x3 = real_deform

    results["loss match=downsampling"] = timed(
        build(model_fn, match="downsampling"), args)

    # ---- structural seams: pyramid / dense blocks / context / upfeat ----
    real_pyramid = mfn_mod._pyramid
    real_dense = mfn_mod._dense_block
    real_context = mfn_mod._context_net
    real_deconv = nn.deconv

    def fake_pyramid(ctx, x, names=("a", "b", "c")):
        feats = []
        b, h, w, _ = x.shape
        from maskflownet_tpu.models.maskflownet import PYRAMID_CH
        for i, ch in enumerate(PYRAMID_CH, start=1):
            h, w = h // 2, w // 2
            feats.append(jnp.broadcast_to(
                jnp.mean(x, axis=(1, 2, 3))[:, None, None, None],
                (b, h, w, ch)).astype(x.dtype))
        return feats

    def fake_dense(ctx, lvl, x):
        from maskflownet_tpu.models.maskflownet import DENSE_CH
        extra = jnp.broadcast_to(jnp.mean(x, axis=-1, keepdims=True),
                                 x.shape[:3] + (sum(DENSE_CH),))
        return jnp.concatenate([extra, x], axis=-1)

    def fake_context(ctx, x):
        return jnp.mean(x, axis=-1, keepdims=True) * jnp.zeros(
            (1, 1, 1, 2), x.dtype)

    def fake_deconv(ctx, name, x, ch, **kw):
        b, h, w, _ = x.shape
        return jnp.broadcast_to(
            jnp.mean(x, axis=(1, 2, 3))[:, None, None, None],
            (b, 2 * h, 2 * w, ch)).astype(x.dtype)

    mfn_mod._pyramid = fake_pyramid
    results["pyramids -> fake"] = timed(build(model_fn), args)
    mfn_mod._pyramid = real_pyramid

    mfn_mod._dense_block = fake_dense
    results["dense blocks -> fake"] = timed(build(model_fn), args)
    mfn_mod._dense_block = real_dense

    mfn_mod._context_net = fake_context
    results["context net -> fake"] = timed(build(model_fn), args)
    mfn_mod._context_net = real_context

    mfn_mod.nn.deconv = fake_deconv
    results["upfeat deconvs -> fake"] = timed(build(model_fn), args)
    mfn_mod.nn.deconv = real_deconv

    base = results["baseline fwd+bwd"]
    for k, v in results.items():
        print(f"{k:28s} {v:8.2f} ms   (delta {base - v:+7.2f} ms)")


if __name__ == "__main__":
    main()
