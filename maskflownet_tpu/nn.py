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
