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

    settings = TrainSettings(
        model="MaskFlownet_S",
        model_cfg=ModelConfig(),
        compute_dtype="bfloat16",
        target_shape=(th, tw),
        orig_shape=(oh, ow),
        geo=presets.geometry_aug_config("chairs", (th, tw), (oh, ow)),
        color=presets.color_aug_config("chairs"),
    )
    trainer = Trainer(settings)

    from maskflownet_tpu.data import DeviceBatchCache

    rng = np.random.RandomState(0)
    n_variants = 8  # distinct host batches cycling through the refresh thread
    batches = []
    for v in range(n_variants):
        img1 = rng.randint(0, 255, (batch, oh, ow, 3)).astype(np.uint8)
        img2 = rng.randint(0, 255, (batch, oh, ow, 3)).astype(np.uint8)
        flow = (rng.randn(batch, oh, ow, 2) * 4).astype(np.float16)
        mask = np.full((batch, 1, 1, 1), 255, np.uint8)
        batches.append((img1, img2, flow, mask))

    counter = {"i": 0}

    def source():
        b = batches[counter["i"] % n_variants]
        counter["i"] += 1
        return b

    # HBM-cached input path (the production mode on slow host links;
    # CLI --device_cache). Device-side augmentation re-randomizes every
    # reuse; the echo factor is reported for transparency.
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
