"""FlowNet-C correlation cost volume (NHWC).

Semantic contract (replicates MXNet ``F.Correlation`` as invoked at reference
``network/MaskFlownet.py:193-195`` with ``kernel_size=1``, ``pad=md``,
``max_displacement=md``, ``stride1=stride2=1``, ``is_multiply=1``):

  ``out[n, y, x, (dy+md)*(2md+1) + (dx+md)]
      = mean_c f1[n, y, x, c] * f2[n, y+dy, x+dx, c]``

for ``dy, dx in [-md, md]``, with zero padding of ``f2`` outside the image.
Displacement channels are y-major, matching the reference CUDA kernel's
channel ordering. Normalization is by the channel count (``sumelems =
kernel^2 * channels`` with kernel 1).

The default path below is a pure-XLA formulation (shift + multiply +
channel-mean); ``maskflownet_tpu.ops.pallas.correlation`` provides the fused
Pallas VMEM kernel used on TPU for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def correlation_xla(f1: Array, f2: Array, md: int) -> Array:
    n, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    inv_c = jnp.asarray(1.0 / c, f1.dtype)
    for dy in range(2 * md + 1):
        for dx in range(2 * md + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy, dx, 0), (n, h, w, c))
            outs.append(jnp.sum(f1 * shifted, axis=-1) * inv_c)
    return jnp.stack(outs, axis=-1)


def correlation(f1: Array, f2: Array, md: int, *, use_pallas: bool | None = None) -> Array:
    """Cost volume with (2md+1)^2 output channels. See module docstring."""
    if use_pallas is None:
        import os
        # Shape-aware auto (measured, benchmarks/corr_ab.py): the fused
        # kernel wins 2.2-2.6x at pyramid levels 3+ but loses at the level-2
        # footprint -- and this PJRT backend stages whole pallas_call
        # operands/results in scoped VMEM (16 MB limit), which OOMs there
        # anyway. Gate on the staged-bytes estimate; MFN_PALLAS=0/1 forces.
        n, h, w, c = f1.shape
        dd = (2 * md + 1) ** 2
        staged = 2 * n * (h * w * (dd + c) + (h + 2 * md) * (w + 2 * md) * c)
        env = os.environ.get("MFN_PALLAS")
        use_pallas = (jax.default_backend() == "tpu"
                      and staged <= 8 * 1024 * 1024
                      if env is None else env not in ("", "0"))
    if use_pallas:
        try:
            from maskflownet_tpu.ops.pallas.correlation import correlation_pallas
            return correlation_pallas(f1, f2, md)
        except ImportError:
            pass
    return correlation_xla(f1, f2, md)
