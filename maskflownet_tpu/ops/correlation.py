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


def correlation(f1: Array, f2: Array, md: int, *,
                use_pallas: bool | None = None,
                leaky: float | None = None) -> Array:
    """Cost volume with (2md+1)^2 output channels. See module docstring.

    ``leaky`` fuses the LeakyReLU(slope) that always follows the cost volume
    in the model into the Pallas kernel epilogue (saving one HBM round trip
    of the largest activation); the XLA path applies it as a separate
    elementwise op (which XLA fuses itself).

    Shape-aware kernel dispatch (measured on v5e, benchmarks/corr_ab.py):

    * fine levels (W >= 96): the H-major Pallas family
      (``correlation_pallas_cmajor``) -- W fills the 128-lane axis and the
      channel reduction runs on sublanes. Wins at the dominant level-2
      footprint (fwd 0.79 vs 0.91 ms XLA; fwd+bwd 1.01 vs 1.88 ms) where
      the NHWC kernel cannot even compile (Mosaic relayout blow-up).
      At narrow W it collapses (L3: 27 ms -- the (th, W) output tiles go
      sub-tile and every write becomes a read-modify-write), hence the
      W threshold.
    * coarse levels (small W, large C): the NHWC kernel
      (``correlation_pallas``) -- C fills the lanes instead. Wins 1.2-2.7x
      over XLA at levels 3/4, ties at 5/6.

    ``MFN_PALLAS=0`` forces XLA; ``MFN_CORR`` forces a family
    ('cmajor'/'nhwc'/'xla') for A/B runs.
    """
    import os

    env_kind = os.environ.get("MFN_CORR")
    if use_pallas is None:
        env = os.environ.get("MFN_PALLAS")
        use_pallas = (jax.default_backend() == "tpu"
                      if env is None else env not in ("", "0"))
    def act(out):
        return out if leaky is None else jnp.where(out >= 0, out, leaky * out)

    n, h, w, c = f1.shape
    dd = (2 * md + 1) ** 2
    if env_kind == "xla" or not use_pallas:
        return act(correlation_xla(f1, f2, md))
    kind = env_kind
    if kind is None:
        if w >= 96:
            kind = "cmajor"
        else:
            # the NHWC kernel stages (TH,W+2md,C->128) lane-padded blocks;
            # keep its staged-bytes guard for exotic large shapes
            staged = 2 * n * (h * w * (dd + c)
                              + (h + 2 * md) * (w + 2 * md) * c)
            kind = "nhwc" if staged <= 12 * 1024 * 1024 else "cmajor"
    try:
        if kind == "cmajor":
            from maskflownet_tpu.ops.pallas.correlation import \
                correlation_pallas_cmajor
            return correlation_pallas_cmajor(f1, f2, md, False, leaky)
        from maskflownet_tpu.ops.pallas.correlation import correlation_pallas
        return correlation_pallas(f1, f2, md, False, leaky)
    except ImportError:
        return act(correlation_xla(f1, f2, md))
