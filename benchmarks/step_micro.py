"""Isolate train-step compute from the input path.

Times (a) the compiled step with device-resident inputs reused every step,
(b) host->device transfer of one chairs batch, (c) the bench.py-style loop.
Run: ``python benchmarks/step_micro.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from maskflownet_tpu.config import presets
    from maskflownet_tpu.models import ModelConfig
    from maskflownet_tpu.training import Trainer, TrainSettings

    th, tw = 320, 448
    oh, ow = 384, 512
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

    rng = np.random.RandomState(0)
    img1 = rng.randint(0, 255, (batch, oh, ow, 3)).astype(np.uint8)
    img2 = rng.randint(0, 255, (batch, oh, ow, 3)).astype(np.uint8)
    flow = (rng.randn(batch, oh, ow, 2) * 4).astype(np.float16)
    mask = np.full((batch, 1, 1, 1), 255, np.uint8)

    # (b) host->device transfer alone
    for _ in range(2):
        dev = [jax.device_put(x) for x in (img1, img2, flow, mask)]
        jax.block_until_ready(dev)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        dev = [jax.device_put(x) for x in (img1, img2, flow, mask)]
        jax.block_until_ready(dev)
    t_h2d = (time.perf_counter() - t0) / iters * 1e3
    nbytes = sum(x.nbytes for x in (img1, img2, flow, mask))
    print(f"h2d transfer: {t_h2d:8.2f} ms  ({nbytes/1e6:.1f} MB, "
          f"{nbytes/1e6/t_h2d*1e3:.0f} MB/s)")

    # (a) device-resident step, same buffers each time
    batch_dev = tuple(dev)
    for _ in range(3):
        m = trainer.train_batch_device(batch_dev, lr=1e-4)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        m = trainer.train_batch_device(batch_dev, lr=1e-4)
    jax.block_until_ready(m["loss"])
    t_step = (time.perf_counter() - t0) / iters * 1e3
    print(f"device-resident step: {t_step:8.2f} ms "
          f"({batch / t_step * 1e3:.1f} samples/s)")


if __name__ == "__main__":
    main()
