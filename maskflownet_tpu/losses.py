"""End-point-error losses and validation metrics (NHWC, f32).

Replicates reference ``network/MaskFlownet.py:548-611`` (EpeLoss,
EpeLossWithMask with optional q-norm, MultiscaleEpe with 'upsampling' match)
and the KITTI Fl-all outlier metric (``pipeline.py:180-182``).

Shapes: pred/label (N, H, W, 2) in (dy, dx); mask (N, H, W, 1) in [0, 1].
All losses return per-sample vectors (N,), as the reference does; reduction
to a scalar happens in the training step.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from maskflownet_tpu.ops import downsample, upsample

Array = jax.Array


def epe_loss(pred: Array, label: Array, eps: float = 0.0) -> Array:
    """Mean EPE per sample (reference ``EpeLoss``, ``MaskFlownet.py:548-561``)."""
    d = pred.astype(jnp.float32) - label.astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + eps)
    return jnp.mean(dist, axis=(1, 2))


def epe_loss_with_mask(pred: Array, label: Array, mask: Array,
                       eps: float = 1e-8, q: float | None = None) -> Array:
    """Masked EPE / q-norm robust loss per sample (``MaskFlownet.py:563-583``).

    With ``q``: ``loss = (sum_c |d_c| + eps) ** q`` (charbonnier-style);
    otherwise the L2 end-point error. Normalized by the mask sum.
    """
    d = pred.astype(jnp.float32) - label.astype(jnp.float32)
    if q is not None:
        dist = (jnp.sum(jnp.abs(d), axis=-1) + eps) ** q
    else:
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + eps)
    m = mask.astype(jnp.float32)[..., 0]
    num = jnp.sum(dist * m, axis=(1, 2))
    den = jnp.sum(m, axis=(1, 2))
    return num / den


def multiscale_epe(flow: Array, mask: Array, predictions: Sequence[Array],
                   *, scales: Sequence[int] = (64, 32, 16, 8, 4),
                   weights: Sequence[float] = (0.005, 0.01, 0.02, 0.08, 0.32),
                   match: str = "upsampling", eps: float = 1e-8,
                   q: float | None = None) -> Array:
    """Weighted multiscale EPE per sample (``MaskFlownet.py:585-611``).

    'upsampling' (the reference default, ``pipeline.py:42-43``): each
    prediction is triangle-upsampled to full resolution. 'downsampling':
    labels and mask are triangle-downsampled to each prediction's scale.
    """
    total = None
    for pred, w, s in zip(predictions, weights, scales):
        if match == "upsampling":
            term = epe_loss_with_mask(upsample(pred, s), flow, mask, eps, q)
        elif match == "downsampling":
            term = epe_loss_with_mask(pred, downsample(flow, s),
                                      downsample(mask, s), eps, q)
        else:
            raise NotImplementedError(match)
        term = term * w
        total = term if total is None else total + term
    return total


def kitti_outlier_rate(pred: Array, label: Array, mask: Array,
                       eps: float = 1e-8) -> Array:
    """KITTI Fl-all per sample: fraction of valid pixels with EPE > 3 px AND
    relative error > 5% (reference ``pipeline.py:180-182``)."""
    err = jnp.sqrt(jnp.sum(
        (pred.astype(jnp.float32) - label.astype(jnp.float32)) ** 2, axis=-1))
    mag = jnp.sqrt(jnp.sum(label.astype(jnp.float32) ** 2, axis=-1))
    bad = (err > 3.0) & (err / (mag + eps) > 0.05)
    m = mask.astype(jnp.float32)[..., 0]
    return jnp.sum(bad * m, axis=(1, 2)) / jnp.sum(m, axis=(1, 2))
