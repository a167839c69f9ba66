"""Device-side chromatic augmentation (NHWC), parity with the reference
``ColorAugmentation`` (``augmentation.py:168-227``).

Pipeline per batch element (identical parameters applied to both images
except the additive noise field, which is drawn independently per image):
hue/saturation rotation via the YIQ-derived 3x3 matrix, additive gaussian
noise with a shared per-batch sigma, mean-preserving contrast + per-channel
gain, brightness shift, clip to [0,1], optional gamma ``x ** exp(g)`` and
optional eigen-rotation. Dataset-specific hyperparameters live in
:mod:`maskflownet_tpu.config.presets` (mirroring ``main.py:390-399``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ColorAugConfig:
    contrast_range: tuple[float, float] = (-0.4, 0.8)
    brightness_sigma: float = 0.1
    channel_range: tuple[float, float] = (0.8, 1.4)
    noise_range: tuple[float, float] = (0.0, 0.04)
    saturation: float = 0.5
    hue: float = 0.5
    gamma_range: tuple[float, float] | None = None
    eigen_aug: bool = False


def _sh_matrix(alpha: Array, theta: Array) -> Array:
    """Hue/saturation mixing matrix (augmentation.py:196-200); (B,3,3)."""
    su = alpha * jnp.cos(theta)
    sw = alpha * jnp.sin(theta)
    rows = [
        [0.299 + 0.701 * su + 0.168 * sw, 0.587 - 0.587 * su + 0.330 * sw,
         0.114 - 0.114 * su - 0.497 * sw],
        [0.299 - 0.299 * su - 0.328 * sw, 0.587 + 0.413 * su + 0.035 * sw,
         0.114 - 0.114 * su + 0.292 * sw],
        [0.299 - 0.300 * su + 1.250 * sw, 0.587 - 0.588 * su - 1.050 * sw,
         0.114 + 0.886 * su - 0.203 * sw],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _eigen_matrix(key: Array, b: int) -> Array:
    """Random channel-space rotation (augmentation.py:203-208); (B,3,3)."""
    ang = jax.random.uniform(key, (b, 3), jnp.float32, -math.pi, math.pi)
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    rows = [
        [c[:, 0] * c[:, 1], s[:, 1] * c[:, 2] + s[:, 0] * c[:, 1] * s[:, 2],
         s[:, 1] * s[:, 2] - s[:, 0] * c[:, 1] * c[:, 2]],
        [-c[:, 0] * s[:, 1], c[:, 1] * c[:, 2] - s[:, 0] * s[:, 1] * s[:, 2],
         c[:, 1] * s[:, 2] + s[:, 0] * s[:, 1] * c[:, 2]],
        [s[:, 0], -c[:, 0] * s[:, 2], c[:, 0] * c[:, 2]],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def color_augmentation(key: Array, img1: Array, img2: Array,
                       cfg: ColorAugConfig) -> tuple[Array, Array]:
    """img1/img2: (B, H, W, 3) in [0, 1]. Returns augmented pair.

    Dtype-preserving: the per-pixel passes run in the input dtype (the
    training engine feeds bf16 so the full-res chain stays half-width,
    round 4); parameter draws and the per-image means stay f32."""
    b = img1.shape[0]
    ks = jax.random.split(key, 9)

    contrast = jax.random.uniform(ks[0], (b, 1, 1, 1), jnp.float32,
                                  *cfg.contrast_range) + 1.0
    brightness = (jax.random.normal(ks[1], (b, 1, 1, 1), jnp.float32)
                  * cfg.brightness_sigma)
    channel = jax.random.uniform(ks[2], (b, 1, 1, 3), jnp.float32,
                                 *cfg.channel_range)
    noise_sigma = jax.random.uniform(ks[3], (), jnp.float32, *cfg.noise_range)
    alpha = 1.0 + jax.random.uniform(ks[4], (b, 1, 1), jnp.float32,
                                     -cfg.saturation, cfg.saturation)
    theta = jax.random.uniform(ks[5], (b, 1, 1), jnp.float32,
                               -cfg.hue * math.pi, cfg.hue * math.pi)
    sh = _sh_matrix(alpha[:, 0, 0], theta[:, 0, 0])  # (B,3,3)
    if cfg.gamma_range is not None:
        gamma = jax.random.uniform(ks[6], (b, 1, 1, 1), jnp.float32,
                                   *cfg.gamma_range)
    eig = _eigen_matrix(ks[7], b) if cfg.eigen_aug else None

    noise_keys = jax.random.split(ks[8], 2)
    out = []
    for img, nk in zip((img1, img2), noise_keys):
        x = img
        dt = x.dtype
        x = jnp.einsum("bhwc,bkc->bhwk", x, sh.astype(dt),
                       preferred_element_type=dt)
        x = x + jax.random.normal(nk, x.shape, dt) * noise_sigma.astype(dt)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True,
                        dtype=jnp.float32).astype(dt)
        x = (x - mean) * (contrast * channel).astype(dt)
        if eig is not None:
            x = jnp.einsum("bhwc,bkc->bhwk", x, eig.astype(dt),
                           preferred_element_type=dt)
        x = x + (mean.astype(jnp.float32) * channel
                 + brightness).astype(dt)
        x = jnp.clip(x, 0.0, 1.0)
        if cfg.gamma_range is not None:
            x = x ** jnp.exp(gamma).astype(dt)
        out.append(x)
    return out[0], out[1]
