"""Benchmark: MaskFlownet-S training throughput on the attached TPU chip.

Measures end-to-end train-step samples/s (augmentation + forward + multiscale
loss + grad + Adam in one compiled program) at the FlyingChairs stage shape
(batch 8, 320x448 crops) and compares against the reference MXNet figure of
~25 samples/s on a single multi-GPU host (BASELINE.md: total_time=0.16-0.21
s/step at batch 4; chairs stage runs batch 8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_S = 25.0


def main():
    import jax

    from maskflownet_tpu.augment import ColorAugConfig, GeometryAugConfig
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

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        m = trainer.train_batch_device(prefetch.get(), lr=1e-4)
    float(m["loss"])  # drain the async dispatch queue
    dt = time.perf_counter() - t0
    prefetch.stop()

    samples_per_s = batch * n_steps / dt
    print(json.dumps({
        "metric": "maskflownet_s_train_throughput_chairs_b8",
        "value": round(samples_per_s, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 3),
        "echo_factor": round(prefetch.echo_factor, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
