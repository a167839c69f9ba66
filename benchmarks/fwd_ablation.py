"""Apportion MaskFlownet-S forward time between correlation, deform-conv,
and the plain convs by monkeypatching each hot op with a cheap stand-in of
the same output shape.

Run: ``python benchmarks/fwd_ablation.py``
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from maskflownet_tpu import nn
from maskflownet_tpu.models import ModelConfig, build_model
import importlib
mfn_mod = importlib.import_module("maskflownet_tpu.models.maskflownet")
import maskflownet_tpu.ops.deform as deform_mod

TH, TW, B = 320, 448, 8


def fake_correlation(f1, f2, md, **kw):
    # same output shape/channels, trivial compute
    c = (2 * md + 1) ** 2
    return jnp.broadcast_to(jnp.mean(f1 + f2, axis=-1, keepdims=True),
                            f1.shape[:3] + (c,))


def fake_deform(x, flow, weight, bias=None, method="auto", **kw):
    # plain 3x3 conv, ignore the flow offsets
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return out + bias if bias is not None else out


def timed_fwd(model_fn, params, img1, img2, iters=20):
    @jax.jit
    def fwd(params, i1, i2):
        ctx = nn.apply_ctx(params, compute_dtype=jnp.bfloat16)
        preds, occs, _ = model_fn(ctx, i1, i2, ModelConfig())
        return preds[-1]

    out = fwd(params, img1, img2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, img1, img2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    model_fn = build_model("MaskFlownet_S")
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(B, TH, TW, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, TH, TW, 3).astype(np.float32))
    params = nn.init(model_fn, jax.random.PRNGKey(0), img1[:1], img2[:1],
                     ModelConfig())

    real_corr = mfn_mod.correlation
    real_deform = deform_mod.flow_guided_deform_conv3x3

    results = {}
    results["baseline"] = timed_fwd(model_fn, params, img1, img2)

    mfn_mod.correlation = fake_correlation
    results["corr -> fake"] = timed_fwd(model_fn, params, img1, img2)
    mfn_mod.correlation = real_corr

    deform_mod.flow_guided_deform_conv3x3 = fake_deform
    results["deform -> plain conv"] = timed_fwd(model_fn, params, img1, img2)

    mfn_mod.correlation = fake_correlation
    results["both fake"] = timed_fwd(model_fn, params, img1, img2)
    mfn_mod.correlation = real_corr
    deform_mod.flow_guided_deform_conv3x3 = real_deform

    base = results["baseline"]
    for k, v in results.items():
        print(f"{k:24s} {v:8.2f} ms   (delta {base - v:+7.2f} ms)")


if __name__ == "__main__":
    main()
