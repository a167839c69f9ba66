import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
from maskflownet_tpu.augment import ColorAugConfig, GeometryAugConfig
from maskflownet_tpu.models import ModelConfig
from maskflownet_tpu.training import Trainer, TrainSettings, sync_metrics
from maskflownet_tpu.data import DeviceBatchCache
from maskflownet_tpu.parallel import make_mesh

th, tw, oh, ow, b = 64, 128, 96, 160, 8
mesh = make_mesh()
settings = TrainSettings(model="MaskFlownet_S", model_cfg=ModelConfig(),
                         compute_dtype="float32",
                         target_shape=(th, tw), orig_shape=(oh, ow),
                         geo=GeometryAugConfig(target_shape=(th, tw), orig_shape=(oh, ow)),
                         color=ColorAugConfig())
trainer = Trainer(settings, mesh=mesh)
r = np.random.RandomState(0)
base = r.randint(0, 255, (b, oh, ow, 3)).astype(np.uint8)
sh = np.roll(base, 3, axis=2)
flow = np.zeros((b, oh, ow, 2), np.float16); flow[..., 1] = -3.0
def source():
    return (base, sh, flow, np.full((b, 1, 1, 1), 255, np.uint8))
cache = DeviceBatchCache(source, mesh, slots=4)
losses = []
for i in range(30):
    m = trainer.train_batch_device(cache.get(), lr=3e-4)
    if i % 5 == 0 or i == 29:
        sm = sync_metrics(m)
        losses.append(sm["loss"])
        print(f"step {i}: {sm}", flush=True)
cache.stop()
assert losses[-1] < losses[0] * 0.85, (losses[0], losses[-1])
print("echo_factor:", round(cache.echo_factor, 2), "transfers:", cache.transfers)
print("LOSS DECREASED: OK")

# one-hot op paths under the real model forward (force onehot off-TPU)
from maskflownet_tpu import nn
from maskflownet_tpu.ops import warp as W, deform as D
import jax.numpy as jnp
img = jnp.asarray(r.rand(2, 16, 24, 5).astype(np.float32))
fl = jnp.asarray((r.rand(2, 16, 24, 2) * 6 - 3).astype(np.float32))
a = W.backwarp(img, fl, method="gather"); bb = W.backwarp(img, fl, method="onehot")
np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-5)
print("ONEHOT WARP MATCHES: OK")
