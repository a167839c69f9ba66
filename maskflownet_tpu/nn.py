"""Minimal functional NN core for the TPU-native MaskFlownet framework.

Design: parameters live in a flat ``dict[str, jax.Array]`` keyed by
slash-separated paths. A forward function takes a :class:`Ctx` as its first
argument and requests parameters by name; the same forward function is used

  * to *infer* parameter shapes (``mode='shape'`` under ``jax.eval_shape`` --
    zero FLOPs, replaces MXNet Gluon's deferred ``in_channels`` inference,
    cf. reference ``network/layer.py:102-108``), and
  * to *apply* the network (``mode='apply'``).

This gives Gluon-style ergonomics with pure-functional JAX semantics: params
are an explicit pytree, so freezing (``fix_head``), optimizer partitioning and
checkpointing are plain dictionary operations.

Compute dtype policy: params are stored float32; ``Ctx`` casts them to
``compute_dtype`` (bfloat16 by default on TPU) on read. Callers keep flow
accumulators and losses in float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
Params = dict[str, Array]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def msra_prelu(slope: float = 0.1) -> Callable[[Array, tuple[int, ...]], Array]:
    """MSRA/He init for PReLU-family activations, 'avg' fan (MXNet semantics).

    Matches ``mx.initializer.MSRAPrelu(slope=0.1)`` used at reference
    ``network/pipeline.py:26``: gaussian with
    ``std = sqrt(2 / ((1 + slope^2) * (fan_in + fan_out) / 2))`` where for a
    conv kernel of shape (kh, kw, cin, cout) ``fan_in = kh*kw*cin`` and
    ``fan_out = kh*kw*cout``.
    """
    magnitude = 2.0 / (1.0 + slope ** 2)

    def init(key: Array, shape: tuple[int, ...]) -> Array:
        if len(shape) == 4:  # (kh, kw, cin, cout)
            rf = shape[0] * shape[1]
            fan_in, fan_out = rf * shape[2], rf * shape[3]
        elif len(shape) == 2:
            fan_in, fan_out = shape
        else:
            fan_in = fan_out = int(math.prod(shape))
        factor = (fan_in + fan_out) / 2.0
        std = math.sqrt(magnitude / factor)
        return std * jax.random.normal(key, shape, dtype=jnp.float32)

    return init


def zeros_init(key: Array, shape: tuple[int, ...]) -> Array:
    del key
    return jnp.zeros(shape, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Parameter context
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Ctx:
    """Parameter store/accessor threaded through forward functions."""

    mode: str  # 'shape' | 'apply'
    params: Params | None = None
    shapes: dict[str, tuple[tuple[int, ...], Callable]] | None = None
    prefix: str = ""
    compute_dtype: Any = jnp.float32

    def scope(self, name: str) -> "Ctx":
        return dataclasses.replace(self, prefix=self.prefix + name + "/")

    def param(self, name: str, shape: tuple[int, ...],
              init_fn: Callable[[Array, tuple[int, ...]], Array]) -> Array:
        full = self.prefix + name
        if self.mode == "shape":
            assert self.shapes is not None
            if full in self.shapes and self.shapes[full][0] != tuple(shape):
                raise ValueError(
                    f"param {full} requested with inconsistent shapes "
                    f"{self.shapes[full][0]} vs {tuple(shape)}")
            self.shapes[full] = (tuple(shape), init_fn)
            return jnp.zeros(shape, dtype=self.compute_dtype)
        assert self.params is not None
        p = self.params[full]
        if p.shape != tuple(shape):
            raise ValueError(f"param {full}: stored shape {p.shape} != requested {shape}")
        return p.astype(self.compute_dtype)


def init(forward: Callable, key: Array, *example_args,
         compute_dtype=jnp.float32, **example_kwargs) -> Params:
    """Create parameters for ``forward(ctx, *args, **kwargs)``.

    Shapes are collected abstractly (``jax.eval_shape``), then materialized
    with per-parameter PRNG splits. Deterministic in ``key``.
    """
    shapes: dict[str, tuple[tuple[int, ...], Callable]] = {}

    def is_arraylike(a):
        return hasattr(a, "shape") and hasattr(a, "dtype")

    arrayness = [is_arraylike(a) for a in example_args]

    def run(*arrays):
        it = iter(arrays)
        full = [next(it) if f else a for f, a in zip(arrayness, example_args)]
        ctx = Ctx(mode="shape", shapes=shapes, compute_dtype=compute_dtype)
        return forward(ctx, *full, **example_kwargs)

    jax.eval_shape(run, *[a for a, f in zip(example_args, arrayness) if f])

    names = sorted(shapes)
    keys = jax.random.split(key, max(len(names), 1))
    return {n: shapes[n][1](k, shapes[n][0]) for n, k in zip(names, keys)}


def apply_ctx(params: Params, compute_dtype=jnp.float32) -> Ctx:
    return Ctx(mode="apply", params=params, compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Layers (NHWC, HWIO kernels)
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x: Array, slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, slope * x)


def conv(ctx: Ctx, name: str, x: Array, cout: int, *, k: int = 3,
         stride: int = 1, dilation: int = 1, act: bool = True,
         bias: bool = True) -> Array:
    """3x3-ish conv + optional LeakyReLU(0.1), mirroring the reference conv
    factory (``network/MaskFlownet.py:166-174``) in NHWC/HWIO layout."""
    cin = x.shape[-1]
    w = ctx.param(f"{name}/w", (k, k, cin, cout), msra_prelu())
    pad = dilation * (k - 1) // 2
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        preferred_element_type=x.dtype)
    if bias:
        b = ctx.param(f"{name}/b", (cout,), zeros_init)
        y = y + b
    return leaky_relu(y) if act else y


def conv_pieces(ctx: Ctx, name: str, pieces: list[Array], cout: int,
                *, act: bool = True) -> Array:
    """`conv(ctx, name, concat(pieces, -1), cout)` computed WITHOUT
    materializing the concat: one conv per piece with the weight sliced
    along its input-channel axis, summed. Identical parameters (a single
    (3,3,sum(cin),cout) weight -- checkpoint-compatible) and identical math
    up to bf16 summation order. Used by the dense blocks (MFN_DENSE=pieces)
    where the growing concatenations are a major source of XLA layout
    copies (round-4 profile: ~7.5 ms/step of pure copies, concentrated on
    the level-2 dense activations)."""
    cin = sum(p.shape[-1] for p in pieces)
    w = ctx.param(f"{name}/w", (3, 3, cin, cout), msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), zeros_init)
    off = 0
    acc = None
    for p in pieces:
        ww = lax.slice_in_dim(w, off, off + p.shape[-1], axis=2)
        y = lax.conv_general_dilated(
            p, ww, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=_DN, preferred_element_type=p.dtype)
        acc = y if acc is None else acc + y
        off += p.shape[-1]
    acc = acc + b
    return leaky_relu(acc) if act else acc


def deconv(ctx: Ctx, name: str, x: Array, cout: int, *, k: int = 4,
           stride: int = 2, pad: int = 1, act: bool = True) -> Array:
    """Transposed conv (kernel 4, stride 2, pad 1 -> exact 2x upsample),
    mirroring the reference deconv factory (``network/MaskFlownet.py:176-183``).

    Implemented as an input-dilated conv: for a transposed conv with kernel k,
    stride s, pad p, the equivalent forward conv uses ``lhs_dilation=s`` and
    symmetric padding ``k - 1 - p``. The kernel is stored in HWIO and trained
    from scratch, so no spatial flip is required for equivalence.
    """
    if not 0 <= pad <= k - 1:
        raise ValueError(f"deconv pad={pad} out of range for k={k}")
    cin = x.shape[-1]
    w = ctx.param(f"{name}/w", (k, k, cin, cout), msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), zeros_init)
    pad = k - 1 - pad  # transposed-conv pad -> forward-conv pad
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride), dimension_numbers=_DN,
        preferred_element_type=x.dtype)
    y = y + b
    return leaky_relu(y) if act else y


# ---------------------------------------------------------------------------
# Space-to-depth conv family (shallow-channel bandwidth optimization)
# ---------------------------------------------------------------------------
#
# Level-1 pyramid activations (C=16 at half resolution) are the most
# bandwidth-hostile tensors in the network: on TPU the channel axis pads to
# the 128-lane tile, so every HBM byte of a C=16 bf16 feature map is moved
# 8x inflated (round-4 op probes: the level-1 convs sustain ~440 GB/s of
# *tiled* bytes -- near HBM peak -- for 1/8 useful payload). The classic fix
# (MLPerf-era TPU ResNet "fused space-to-depth") is to hold these features
# in space-to-depth form -- (B, H/2, W/2, 4C), 2x2 spatial blocks folded
# into channels -- so the tile padding drops from 8x to 2x, and to fold the
# reshuffle into the convs themselves by expanding the stored 3x3 kernels
# into equivalent kernels over the s2d layout at trace time.
#
# The three ops below are EXACT reformulations (same MACs against the same
# stored (3,3,cin,cout)/(cout,) parameters -- checkpoint-compatible; only
# zero-taps are added and the bf16 accumulation order changes):
#
#   conv_s2d_in   3x3 stride-2 conv from a raw image, output in s2d form:
#                 a 2x2 conv over the 4x4-space-to-depth'd input.
#   conv_s2d      3x3 stride-1 conv with input AND output in s2d form:
#                 a 3x3 conv over (r,s,c)-folded channels.
#   conv_from_s2d 3x3 stride-2 conv consuming an s2d input, standard output:
#                 a 2x2 conv at the s2d resolution.
#
# Channel convention: s2d(x, f)[..., (r*f + s)*C + c] = x[..., f*i + r,
# f*j + s, c] (row-major spatial blocks, channels fastest).


def space_to_depth(x: Array, f: int) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: Array, f: int) -> Array:
    b, h, w, fc = x.shape
    c = fc // (f * f)
    x = x.reshape(b, h, w, f, f, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * f, w * f, c)


def _tap(rg: int):
    """Global row offset (relative to the 2x block origin) -> (kernel index
    delta, within-block row) for a factor-2 s2d layout."""
    return rg // 2, rg % 2  # python floor/mod: -1 -> (-1, 1)


def conv_s2d_in(ctx: Ctx, name: str, x: Array, cout: int) -> Array:
    """3x3 stride-2 conv + LeakyReLU from a raw (B,H,W,cin) input (H, W
    divisible by 4) to s2d-form output (B, H/4, W/4, 4*cout).

    out s2d block (p,q): rows 2p+dy relative to the 4-row input block, so a
    2x2 kernel over the 4x4-s2d input (top/left zero pad 1) covers every
    tap exactly once."""
    cin = x.shape[-1]
    w = ctx.param(f"{name}/w", (3, 3, cin, cout), msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), zeros_init)
    wx = jnp.zeros((2, 2, 16 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    rg, cg = 2 * p + dy, 2 * q + dx
                    ki, r = (0, 3) if rg < 0 else (1, rg)
                    kj, s = (0, 3) if cg < 0 else (1, cg)
                    a, o = (r * 4 + s) * cin, (p * 2 + q) * cout
                    wx = wx.at[ki, kj, a:a + cin, o:o + cout].set(
                        w[dy + 1, dx + 1])
    y = lax.conv_general_dilated(
        space_to_depth(x, 4), wx, window_strides=(1, 1),
        padding=[(1, 0), (1, 0)], dimension_numbers=_DN,
        preferred_element_type=x.dtype)
    return leaky_relu(y + jnp.tile(b, 4))


def conv_s2d(ctx: Ctx, name: str, z: Array, cout: int) -> Array:
    """3x3 stride-1 conv + LeakyReLU entirely in s2d form: (B,h,w,4*cin) ->
    (B,h,w,4*cout). Logical cin = z.shape[-1] // 4."""
    cin = z.shape[-1] // 4
    w = ctx.param(f"{name}/w", (3, 3, cin, cout), msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), zeros_init)
    wx = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    di, r = _tap(p + dy)
                    dj, s = _tap(q + dx)
                    a, o = (r * 2 + s) * cin, (p * 2 + q) * cout
                    wx = wx.at[di + 1, dj + 1, a:a + cin, o:o + cout].set(
                        w[dy + 1, dx + 1])
    y = lax.conv_general_dilated(
        z, wx, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=_DN, preferred_element_type=z.dtype)
    return leaky_relu(y + jnp.tile(b, 4))


def conv_s2d_down(ctx: Ctx, name: str, z: Array, cout: int) -> Array:
    """3x3 STRIDE-2 conv + LeakyReLU with input and output both in s2d(f=2)
    form: (B,h,w,4*cin) [logical (2h,2w,cin)] -> (B,h/2,w/2,4*cout)
    [logical (h,w,cout)]. Extends the s2d pyramid to level 2 (conv2a when
    level 1 is in s2d form): output s2d block (P,Q) sub-pixel (p,q) reads
    logical rows 4P+2p+dy, i.e. z rows 2P+(2p+dy)//2 -- a 3-tap kernel at
    stride 2 with pad 1. Exact same MACs against the same stored
    (3,3,cin,cout) parameters."""
    cin = z.shape[-1] // 4
    w = ctx.param(f"{name}/w", (3, 3, cin, cout), msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), zeros_init)
    wx = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    di, r = _tap(2 * p + dy)
                    dj, s = _tap(2 * q + dx)
                    a, o = (r * 2 + s) * cin, (p * 2 + q) * cout
                    wx = wx.at[di + 1, dj + 1, a:a + cin, o:o + cout].set(
                        w[dy + 1, dx + 1])
    y = lax.conv_general_dilated(
        z, wx, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=_DN, preferred_element_type=z.dtype)
    return leaky_relu(y + jnp.tile(b, 4))


def conv_from_s2d(ctx: Ctx, name: str, z: Array, cout: int) -> Array:
    """3x3 stride-2 conv + LeakyReLU consuming an s2d input (B,h,w,4*cin),
    producing a standard (B,h,w,cout) output (the s2d grid stride matches
    the conv stride, so output resolution equals the s2d resolution)."""
    cin = z.shape[-1] // 4
    w = ctx.param(f"{name}/w", (3, 3, cin, cout), msra_prelu())
    b = ctx.param(f"{name}/b", (cout,), zeros_init)
    wx = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            di, r = _tap(dy)
            dj, s = _tap(dx)
            a = (r * 2 + s) * cin
            wx = wx.at[di + 1, dj + 1, a:a + cin, :].set(w[dy + 1, dx + 1])
    y = lax.conv_general_dilated(
        z, wx, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=_DN, preferred_element_type=z.dtype)
    return leaky_relu(y + b)
