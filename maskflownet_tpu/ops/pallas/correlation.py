"""Fused Pallas TPU kernel for the FlowNet-C correlation cost volume.

Semantics identical to ``ops.correlation.correlation_xla`` (see that module's
contract; reference ``network/MaskFlownet.py:193-195``): y-major displacement
channels, zero padding, channel-mean normalization.

Design (VMEM-resident, no HBM roundtrips between displacements):
  * f2 is pre-padded by ``md`` in H and W (host-side jnp.pad, fused by XLA),
    so every displacement becomes a *static* slice of the padded tile --
    no dynamic shifts on the VPU.
  * grid = (B,): each program holds one sample's f1 (H, W, C) and padded f2
    (H+2md, W+2md, C) in VMEM and emits (H, W, D^2). At the largest use site
    (level 2 of a 320x448 input: 80x112x32, md=4) this is ~3 MB of VMEM.
  * Channels sit on the lane axis, so the multiply + channel-reduce is a
    VPU lane reduction; each f2 element is read from HBM exactly once and
    reused for all D^2 displacements (the XLA fallback re-reads it D^2
    times from HBM when fusion fails).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _corr_kernel(f1_ref, f2_ref, out_ref, *, md: int, n_ch: int):
    d = 2 * md + 1
    h = f1_ref.shape[1]
    w = f1_ref.shape[2]
    a = f1_ref[0].astype(jnp.float32)  # (H, W, C)
    inv_c = 1.0 / n_ch
    outs = []
    for dy in range(d):
        for dx in range(d):
            b = f2_ref[0, dy:dy + h, dx:dx + w, :].astype(jnp.float32)
            outs.append(jnp.sum(a * b, axis=-1) * inv_c)  # (H, W)
    out_ref[0] = jnp.stack(outs, axis=-1).astype(out_ref.dtype)


def _corr_fwd_call(f1: Array, f2: Array, md: int, interpret: bool) -> Array:
    n, h, w, c = f1.shape
    d = 2 * md + 1
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    kernel = functools.partial(_corr_kernel, md=md, n_ch=c)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, d * d), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d * d), f1.dtype),
        interpret=interpret,
    )(f1, f2p)


def _corr_bwd_f1_kernel(g_ref, f2p_ref, out_ref, *, md: int, n_ch: int):
    """dL/df1[y,x,c] = sum_d g[y,x,d] * f2[y+dy-md, x+dx-md, c] / C."""
    d = 2 * md + 1
    h, w = g_ref.shape[1], g_ref.shape[2]
    inv_c = 1.0 / n_ch
    acc = jnp.zeros((h, w, f2p_ref.shape[3]), jnp.float32)
    for dy in range(d):
        for dx in range(d):
            g = g_ref[0, :, :, dy * d + dx].astype(jnp.float32)[..., None]
            b = f2p_ref[0, dy:dy + h, dx:dx + w, :].astype(jnp.float32)
            acc = acc + g * b
    out_ref[0] = (acc * inv_c).astype(out_ref.dtype)


def _corr_bwd_f2_kernel(gp_ref, f1p_ref, out_ref, *, md: int, n_ch: int):
    """dL/df2[y,x,c] = sum_d g[y-(dy-md), x-(dx-md), d] * f1[same, c] / C.

    ``gp``/``f1p`` arrive padded by md; the summand for displacement (dy,dx)
    is the static slice starting at (2md-dy, 2md-dx) of their product.
    """
    d = 2 * md + 1
    hp, wp = gp_ref.shape[1], gp_ref.shape[2]
    h, w = hp - 2 * md, wp - 2 * md
    inv_c = 1.0 / n_ch
    acc = jnp.zeros((h, w, f1p_ref.shape[3]), jnp.float32)
    for dy in range(d):
        for dx in range(d):
            y0, x0 = 2 * md - dy, 2 * md - dx
            g = gp_ref[0, y0:y0 + h, x0:x0 + w, dy * d + dx].astype(
                jnp.float32)[..., None]
            a = f1p_ref[0, y0:y0 + h, x0:x0 + w, :].astype(jnp.float32)
            acc = acc + g * a
    out_ref[0] = (acc * inv_c).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1: Array, f2: Array, md: int = 4,
                       interpret: bool = False) -> Array:
    return _corr_fwd_call(f1, f2, md, interpret)


def _corr_fwd(f1, f2, md, interpret):
    return _corr_fwd_call(f1, f2, md, interpret), (f1, f2)


def _corr_bwd(md, interpret, res, g):
    f1, f2 = res
    n, h, w, c = f1.shape
    d = 2 * md + 1
    pad = ((0, 0), (md, md), (md, md), (0, 0))
    f2p = jnp.pad(f2, pad)
    df1 = pl.pallas_call(
        functools.partial(_corr_bwd_f1_kernel, md=md, n_ch=c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, d * d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f1.shape, f1.dtype),
        interpret=interpret,
    )(g, f2p)
    gp = jnp.pad(g, pad)
    f1p = jnp.pad(f1, pad)
    df2 = pl.pallas_call(
        functools.partial(_corr_bwd_f2_kernel, md=md, n_ch=c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, d * d),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f2.shape, f2.dtype),
        interpret=interpret,
    )(gp, f1p)
    return df1, df2


correlation_pallas.defvjp(_corr_fwd, _corr_bwd)
