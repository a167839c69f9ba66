"""A/B the space-to-depth pyramid paths (cfg.s2d / cfg.s2d_l2) on the real
chip.

Level 1: the C=16 half-resolution pyramid activations move 8x tile-inflated
through HBM in standard NHWC form (see nn.conv_s2d_in); the s2d form cuts
that to 2x at the price of ~4x zero-tap FLOPs on a few GFLOP of convs.
Level 2 (round 5, VERDICT r4 W2a): C=32 features are 4x tile-inflated; the
f=2 s2d form gives exactly 128 channels -- a perfect lane fill -- via
nn.conv_s2d_down, at the cost of one depth_to_space materialization (the
decoders DO read the level-2 features, unlike level 1's).

Times the full compiled train step (host-geo configuration, then the
aug-inclusive bench.py headline configuration) plus the batched
pyramid-pair forward alone, for s2d off / level-1 / level-1+2.

Run: ``python benchmarks/s2d_ab.py``
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from step_ablation import device_batch, time_step  # noqa: E402

from maskflownet_tpu import nn  # noqa: E402
from maskflownet_tpu.config import presets  # noqa: E402
from maskflownet_tpu.models import ModelConfig  # noqa: E402
from maskflownet_tpu.models.maskflownet import _pyramid_pair  # noqa: E402
from maskflownet_tpu.training import Trainer, TrainSettings  # noqa: E402

TH, TW, B = 320, 448, 8


def time_pyramid(params, img1, img2, cfg, k=30, repeats=5):
    """K-loop carried timing: on this tunneled backend, dispatch of a
    non-donated program is fire-and-forget (block_until_ready returns
    early), so honest numbers need K executions inside ONE dispatch with a
    carried dependency; (t(2K)-t(K))/K cancels the RTT + drain."""
    def body(i1):
        ctx = nn.apply_ctx(params, compute_dtype=jnp.bfloat16)
        c1s, c2s = _pyramid_pair(ctx, i1.astype(jnp.bfloat16),
                                 img2.astype(jnp.bfloat16), cfg=cfg)
        s = sum(jnp.sum(jnp.abs(c).astype(jnp.float32)) for c in c1s + c2s)
        return i1 + (1e-12 * s).astype(i1.dtype)

    def timed(kk):
        run = jax.jit(lambda c: jax.lax.fori_loop(
            0, kk, lambda i, c: body(c), c))
        float(jnp.sum(run(img1)))
        best = 1e9
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(run(img1)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * k) - timed(k)) / k * 1e3


def main():
    batch = device_batch()
    rng = np.random.RandomState(0)
    i1 = jnp.asarray(rng.rand(B, TH, TW, 3).astype(np.float32))
    i2 = jnp.asarray(rng.rand(B, TH, TW, 3).astype(np.float32))

    variants = [("off", ModelConfig(s2d=False)),
                ("l1", ModelConfig(s2d=True)),
                ("l1+l2", ModelConfig(s2d=True, s2d_l2=True))]
    for name, cfg in variants:
        tr = Trainer(TrainSettings(
            model="MaskFlownet_S", model_cfg=cfg,
            compute_dtype="bfloat16", target_shape=(TH, TW),
            orig_shape=(384, 512), geo=None,
            color=presets.color_aug_config("chairs")))
        ms = time_step(tr, batch, iters=50)
        pyr = time_pyramid(tr.params, i1, i2, cfg)
        # aug-inclusive step (the bench.py headline program)
        tr_aug = Trainer(TrainSettings(
            model="MaskFlownet_S", model_cfg=cfg,
            compute_dtype="bfloat16", target_shape=(TH, TW),
            orig_shape=(384, 512),
            geo=presets.geometry_aug_config("chairs", (TH, TW), (384, 512)),
            color=presets.color_aug_config("chairs")))
        rngo = np.random.RandomState(1)
        ob = (jnp.asarray(rngo.randint(0, 255, (B, 384, 512, 3)).astype(np.uint8)),
              jnp.asarray(rngo.randint(0, 255, (B, 384, 512, 3)).astype(np.uint8)),
              jnp.asarray((rngo.randn(B, 384, 512, 2) * 4).astype(np.float16)),
              jnp.asarray(np.full((B, 1, 1, 1), 255, np.uint8)))
        ms_aug = time_step(tr_aug, ob, iters=50)
        print(f"s2d={name}: step(host-aug) {ms:.2f} ms  "
              f"step(aug-incl) {ms_aug:.2f} ms  pyramid-pair fwd {pyr:.2f} ms",
              flush=True)
        del tr, tr_aug


if __name__ == "__main__":
    main()
