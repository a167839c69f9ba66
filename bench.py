"""Benchmark: MaskFlownet-S training throughput on the attached TPU chip.

Measures end-to-end train-step samples/s (augmentation + forward + multiscale
loss + grad + Adam in one compiled program) at the FlyingChairs stage shape
(batch 8, 320x448 crops) and compares against the reference MXNet figure of
~25 samples/s on a single multi-GPU host (BASELINE.md: total_time=0.16-0.21
s/step at batch 4; chairs stage runs batch 8).

Reported fields (one JSON line):
  value / vs_baseline   cached-input throughput (HBM-resident batches with
                        background refresh -- the --device_cache production
                        path; echo_factor tells how much echoing occurred)
  uncached_samples_per_s  the classic double-buffered host->device prefetch
                        path (no reuse): host aug + wire transfer in the loop
  step_ms               compiled-step wall time (cached inputs)
  flops_per_step_g      XLA cost-analysis FLOPs of the train step
  mfu                   flops/step / step_time / chip bf16 peak
See PERF.md for the step-time breakdown and roofline discussion.
"""

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_S = 25.0

# dense peak TFLOP/s (bf16) per chip kind
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,   # Trillium
}


def main():
    import os

    import jax
    # persistent compilation cache: the chairs-stage train step compiles in
    # minutes over a tunneled backend; cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from maskflownet_tpu.config import presets
    from maskflownet_tpu.models import ModelConfig
    from maskflownet_tpu.training import Trainer, TrainSettings

    th, tw = 320, 448   # chairs target_shape
    oh, ow = 384, 512   # chairs orig_shape
    batch = 8

    # Production input placement (CLI defaults): geometric augmentation on
    # the host input-pipeline thread, color augmentation on device (fresh
    # per echo-reuse), batches HBM-cached with background refresh.
    settings = TrainSettings(
        model="MaskFlownet_S",
        model_cfg=ModelConfig(),
        compute_dtype="bfloat16",
        target_shape=(th, tw),
        orig_shape=(oh, ow),
        geo=None,
        color=presets.color_aug_config("chairs"),
    )
    trainer = Trainer(settings)

    from maskflownet_tpu.augment.host_geometry import batch_host_geometry
    from maskflownet_tpu.config.presets import geometry_aug_config
    from maskflownet_tpu.data import DeviceBatchCache
    from maskflownet_tpu.parallel import DevicePrefetcher

    geo_cfg = geometry_aug_config("chairs", (th, tw), (oh, ow))
    rng = np.random.RandomState(0)
    n_variants = 8  # distinct host batches cycling through the refresh thread
    batches = []
    for v in range(n_variants):
        img1 = rng.randint(0, 255, (batch, oh, ow, 3)).astype(np.uint8)
        img2 = rng.randint(0, 255, (batch, oh, ow, 3)).astype(np.uint8)
        flow = (rng.randn(batch, oh, ow, 2) * 4).astype(np.float32)
        batches.append((img1, img2, flow))

    counter = {"i": 0}
    aug_rng = np.random.RandomState(1)

    def source():
        img1, img2, flow = batches[counter["i"] % n_variants]
        counter["i"] += 1
        i1, i2, fl, mk = batch_host_geometry(
            aug_rng, img1.astype(np.float32), img2.astype(np.float32),
            flow, None, geo_cfg)
        return (np.clip(i1 + 0.5, 0, 255).astype(np.uint8),
                np.clip(i2 + 0.5, 0, 255).astype(np.uint8),
                fl.astype(np.float16),
                np.clip(mk * 255 + 0.5, 0, 255).astype(np.uint8))

    prefetch = DeviceBatchCache(source, trainer.mesh, slots=8)

    # warmup / compile
    for _ in range(3):
        m = trainer.train_batch_device(prefetch.get(), lr=1e-4)
    assert np.isfinite(float(m["loss"])), m

    # ---- cached-input throughput (production --device_cache path) ----
    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        m = trainer.train_batch_device(prefetch.get(), lr=1e-4)
    float(m["loss"])  # drain the async dispatch queue
    dt = time.perf_counter() - t0
    samples_per_s = batch * n_steps / dt
    echo = prefetch.echo_factor

    # ---- pure compiled-step time (device-resident constant batch) ----
    const_batch = prefetch.get()
    for _ in range(2):
        m = trainer.train_batch_device(const_batch, lr=1e-4)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        m = trainer.train_batch_device(const_batch, lr=1e-4)
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / n_steps * 1e3
    prefetch.stop()

    # ---- uncached path: double-buffered prefetch, every batch crosses the
    # wire after host augmentation (the --device_cache 0 CLI default) ----
    pf = DevicePrefetcher(source, trainer.mesh, depth=2)
    for _ in range(2):
        m = trainer.train_batch_device(pf.get(), lr=1e-4)
    float(m["loss"])
    n_un = 15
    t0 = time.perf_counter()
    for _ in range(n_un):
        m = trainer.train_batch_device(pf.get(), lr=1e-4)
    float(m["loss"])
    uncached_sps = batch * n_un / (time.perf_counter() - t0)
    pf.stop()

    # ---- FLOPs + MFU from XLA cost analysis ----
    flops = mfu = None
    try:
        import jax.numpy as jnp
        key = jax.random.PRNGKey(0)
        lowered = trainer._train_step.lower(
            trainer.params, trainer.opt_state, *const_batch, key,
            jnp.asarray(1e-4, jnp.float32))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
        peak = _PEAK_TFLOPS.get(jax.devices()[0].device_kind)
        if peak:
            mfu = flops / (step_ms * 1e-3) / (peak * 1e12)
    except Exception:
        pass

    out = {
        "metric": "maskflownet_s_train_throughput_chairs_b8",
        "value": round(samples_per_s, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 3),
        "echo_factor": round(echo, 2),
        "uncached_samples_per_s": round(uncached_sps, 2),
        "step_ms": round(step_ms, 2),
        "device": str(jax.devices()[0].device_kind),
    }
    if flops is not None:
        out["flops_per_step_g"] = round(flops / 1e9, 1)
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
