"""Flow-guided deformable 3x3 convolution (NHWC).

Semantic contract (replicates MXNet ``F.contrib.DeformableConvolution`` as the
reference uses it -- ``network/layer.py:117-121`` invoked with offsets that
are the *same* flow vector replicated over all 9 taps,
``network/MaskFlownet.py:230,248,266,284`` and cascade ``:465-525``):

  ``out[n, y, x, o] = bias[o] + sum_{ky,kx in {-1,0,1}} sum_c
        w[ky+1, kx+1, c, o] *
        bilinear(x_in, y + dy(n,y,x) + ky, x + dx(n,y,x) + kx)[c]``

i.e. a 3x3 convolution whose sampling window is rigidly shifted per output
pixel by the flow (dy, dx). Out-of-bounds bilinear corners contribute zero
(MXNet ``deformable_im2col`` semantics). Note this is *not* warp-then-conv:
all 9 taps use the offset of the window center.

Implementation: since taps are integer shifts of a single fractional offset,
each tap equals ``backwarp(x, flow + (ky, kx))``. We gather the 9 warped maps
and contract channels with one matmul (MXU-friendly 1x1 conv over 9*Cin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maskflownet_tpu import nn
from maskflownet_tpu.ops.warp import backwarp

Array = jax.Array


def flow_guided_deform_conv3x3(x: Array, flow: Array, weight: Array,
                               bias: Array | None = None) -> Array:
    """x: (N,H,W,Cin); flow: (N,H,W,2) (dy,dx) pixels at this level;
    weight: (3,3,Cin,Cout); bias: (Cout,) or None. -> (N,H,W,Cout)."""
    n, h, w, cin = x.shape
    taps = []
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            off = jnp.asarray([ky, kx], dtype=jnp.float32)
            taps.append(backwarp(x, flow.astype(jnp.float32) + off))
    stacked = jnp.concatenate(taps, axis=-1)  # (N,H,W,9*Cin)
    wmat = weight.reshape(9 * cin, -1)  # tap-major (ky,kx) rows, matching stack order
    out = jax.lax.dot_general(
        stacked.reshape(-1, 9 * cin), wmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    ).reshape(n, h, w, -1)
    if bias is not None:
        out = out + bias
    return out


def deform_conv(ctx: "nn.Ctx", name: str, x: Array, flow: Array, cout: int,
                *, use_bias: bool = True) -> Array:
    """Parameterized wrapper (the framework's ``DeformableConv2D`` equivalent,
    cf. reference ``network/layer.py:32-124``; always kernel 3, stride 1,
    pad 1, one deformable group)."""
    cin = x.shape[-1]
    wgt = ctx.param(f"{name}/w", (3, 3, cin, cout), nn.msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), nn.zeros_init) if use_bias else None
    return flow_guided_deform_conv3x3(x, flow, wgt, b)
