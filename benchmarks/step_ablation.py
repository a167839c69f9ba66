"""Ablate train-step components on the real chip to find the time sinks.

Times the compiled chairs-stage train step (device-resident inputs, host-geo
configuration like bench.py) under several component swaps: color aug on/off,
deform method, correlation path, forward-only vs full step.

Run: ``python benchmarks/step_ablation.py [keys...]``
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from maskflownet_tpu.config import presets
from maskflownet_tpu.models import ModelConfig
from maskflownet_tpu.training import Trainer, TrainSettings

TH, TW, B = 320, 448, 8


def make_trainer(color=True, loss_match="upsampling"):
    return Trainer(TrainSettings(
        model="MaskFlownet_S", model_cfg=ModelConfig(),
        compute_dtype="bfloat16", target_shape=(TH, TW),
        orig_shape=(384, 512), geo=None, loss_match=loss_match,
        color=presets.color_aug_config("chairs") if color else None))


def device_batch():
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randint(0, 255, (B, TH, TW, 3)).astype(np.uint8))
    img2 = jnp.asarray(rng.randint(0, 255, (B, TH, TW, 3)).astype(np.uint8))
    flow = jnp.asarray((rng.randn(B, TH, TW, 2) * 4).astype(np.float16))
    mask = jnp.asarray(np.full((B, 1, 1, 1), 255, np.uint8))
    return img1, img2, flow, mask


def time_step(trainer, batch, iters=20):
    for _ in range(3):
        m = trainer.train_batch_device(batch, lr=1e-4)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = trainer.train_batch_device(batch, lr=1e-4)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def time_fwd(trainer, batch, iters=20):
    from maskflownet_tpu import nn
    s = trainer.settings
    model_fn, cfg, dtype = trainer.model_fn, s.model_cfg, s.dtype()

    @jax.jit
    def fwd(params, img1, img2):
        i1 = img1.astype(jnp.float32) / 255.0
        i2 = img2.astype(jnp.float32) / 255.0
        ctx = nn.apply_ctx(params, compute_dtype=dtype)
        preds, occs, _ = model_fn(ctx, i1, i2, cfg)
        return preds[-1]

    img1, img2 = batch[0], batch[1]
    out = fwd(trainer.params, img1, img2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(trainer.params, img1, img2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    sel = set(sys.argv[1:])
    batch = device_batch()
    results = {}

    def want(k):
        return not sel or k in sel

    if want("full"):
        results["full step (color aug, gather)"] = time_step(
            make_trainer(color=True), batch)
    if want("nocolor"):
        results["step, no color aug"] = time_step(
            make_trainer(color=False), batch)
    if want("fwd"):
        results["forward only"] = time_fwd(make_trainer(), batch)
    if want("onehot"):
        os.environ["MFN_DEFORM"] = "onehot"
        os.environ["MFN_WARP"] = "onehot"
        results["step, onehot warp/deform"] = time_step(
            make_trainer(color=True), batch)
        os.environ.pop("MFN_DEFORM"), os.environ.pop("MFN_WARP")
    if want("pallas_corr"):
        os.environ["MFN_PALLAS"] = "1"
        results["step, pallas corr"] = time_step(
            make_trainer(color=True), batch)
        os.environ.pop("MFN_PALLAS")
    if want("downsampling"):
        # multiscale loss with the 'downsampling' match (labels downsampled
        # per scale instead of predictions upsampled to full res -- the
        # reference supports both, MaskFlownet.py:602-608); measures how
        # much the five full-res upsampled EPE maps cost
        results["step, loss match=downsampling"] = time_step(
            make_trainer(color=True, loss_match="downsampling"), batch)
    if want("xla_corr"):
        os.environ["MFN_PALLAS"] = "0"
        results["step, xla corr"] = time_step(
            make_trainer(color=True), batch)
        os.environ.pop("MFN_PALLAS")

    for k, v in results.items():
        print(f"{k:36s} {v:8.2f} ms  ({B / v * 1e3:6.1f} samples/s)")


if __name__ == "__main__":
    main()
