"""MXNet ``.params`` checkpoint importer.

The reference's acceptance path is its published Gluon checkpoints
(``weights/README.md:5-9``, loaded at ``network/pipeline.py:56-63``). This
module converts those files into this framework's parameter dict / ``.npz``
checkpoints so forward parity and import-start fine-tunes are one command:

    python -m maskflownet_tpu.tools.import_mxnet dbbSep30-1206_1000000.params \
        out.npz --network MaskFlownet_S

Two layers:

1. A from-scratch reader/writer for the MXNet NDArray list file format
   (``mx.nd.save``; what Gluon 1.5's ``save_parameters`` emits). Layout,
   little-endian throughout:

   * container: uint64 magic ``0x112`` (kMXAPINDArrayListMagic), uint64
     reserved, uint64 array count, the NDArray records, uint64 name count,
     names as (uint64 length, bytes).
   * dense NDArray record: uint32 version magic — 0xF993FAC8 (V1),
     0xF993FAC9 (V2, adds an int32 storage-type word), 0xF993FACA (V3, same
     dense layout as V2) — then shape (uint32 ndim + int64 dims; the legacy
     pre-V1 format has no magic and uint32 dims), int32 dev_type, int32
     dev_id, int32 type_flag, raw data bytes. Only dense (storage type 0)
     records are supported.

2. The Gluon->framework name map + layout transposes. Gluon 1.5
   ``save_parameters`` keys are structural attribute paths
   (``conv1a.0.weight``; the cascade head under ``MaskFlownet_S.``;
   ``deform5.weight``; ``upfeat5.0.weight``); ``export``-style ``arg:``/
   ``aux:`` prefixes are stripped if present. Transforms:

   * conv / deform-conv weights: NCHW (Cout,Cin,kh,kw) -> HWIO via
     transpose(2,3,1,0). Tap order (row-major ky,kx) is preserved, matching
     ``ops.deform``'s tap-major weight layout.
   * deconv (Conv2DTranspose, ``upfeat*``) weights: MXNet stores
     (Cin,Cout,kh,kw); our ``nn.deconv`` computes the transposed conv as an
     input-dilated *forward* conv, which is equivalent to the true transposed
     conv with the spatially flipped kernel -- so the import is
     transpose(2,3,0,1) + flip(kh,kw).
   * biases: unchanged.

Forward parity (proven, tests/test_parity_oracle.py): the reference builds
deform offsets as ``F.repeat(F.expand_dims(flow, axis=1), 9, axis=1)
.reshape((0,-3,-2))`` (``MaskFlownet.py:230`` et al.) — the (dy, dx) *pair*
tiled 9 times, which is exactly MXNet's per-tap interleaved (y, x) offset
layout. Every tap therefore receives the clean (dy, dx) offset, so this
framework's native rigid-window deform semantics ARE the reference
semantics; imported checkpoints need no compat mode. (An earlier round
hypothesized an interleaving quirk — that misread the expression by
dropping the expand_dims/reshape pair; the oracle test settles it
numerically.)

Channel-order caveat (real, dataset-dependent): the reference decodes
KITTI/HD1K/Things3D frames with cv2 => **BGR** (``reader/kitti.py:54-56``,
``reader/hd1k.py``, ``main.py:297``) but FlyingChairs (own PPM codec) and
Sintel (skimage, ``reader/sintel.py:76``) => **RGB**. This framework is
RGB-only (``data/codecs.py``). First-layer conv weights are channel-order
sensitive, so importing a checkpoint whose *training* data was BGR for use
on RGB inputs should pass ``input_channel_order='bgr'`` (CLI
``--input_channel_order bgr``), which reverses the image input channels of
``conv1a`` (both networks) and the cascade's ``conv1x`` (first 3 of its 4
input channels). Checkpoints fine-tuned on *mixed* RGB+BGR batches (e.g.
``sintel_kitti2015_hd1k``) saw inconsistent channel order in the reference
itself; for those the flag choice is a wash — prefer whichever matches the
dominant mixture component.
"""

from __future__ import annotations

import struct

import numpy as np

_LIST_MAGIC = 0x112
_V1_MAGIC = 0xF993FAC8
_V2_MAGIC = 0xF993FAC9
_V3_MAGIC = 0xF993FACA

# MXNet type_flag -> numpy dtype (mshadow base.h)
_DTYPES = {0: np.float32, 1: np.float64, 2: np.float16, 3: np.uint8,
           4: np.int32, 5: np.int8, 6: np.int64}
_DTYPE_FLAGS = {np.dtype(v): k for k, v in _DTYPES.items()}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("truncated .params file")
        self.pos += n
        return out


def _read_ndarray(r: _Reader) -> np.ndarray:
    first = r.read("I")
    if first in (_V2_MAGIC, _V3_MAGIC):
        stype = r.read("i")
        if stype != 0:  # kDefaultStorage
            raise NotImplementedError(
                f"sparse NDArray (storage type {stype}) not supported")
        ndim = r.read("I")
        shape = tuple(r.read("q") for _ in range(ndim))
    elif first == _V1_MAGIC:
        ndim = r.read("I")
        shape = tuple(r.read("q") for _ in range(ndim))
    else:
        # legacy: `first` was the shape's ndim, dims are uint32
        ndim = first
        if ndim > 32:
            raise ValueError(f"unrecognized .params record (magic {first:#x})")
        shape = tuple(r.read("I") for _ in range(ndim))
    r.read("ii")  # dev_type, dev_id
    type_flag = r.read("i")
    if type_flag not in _DTYPES:
        raise ValueError(f"unknown MXNet type_flag {type_flag}")
    dtype = np.dtype(_DTYPES[type_flag])
    count = int(np.prod(shape, dtype=np.int64)) if shape else 1
    raw = r.read_bytes(count * dtype.itemsize)
    return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()


def read_mxnet_params(path: str) -> dict[str, np.ndarray]:
    """Parse an MXNet NDArray-list file -> {name: array}.

    ``arg:``/``aux:`` prefixes (module ``export`` format) are stripped.
    """
    with open(path, "rb") as fp:
        r = _Reader(fp.read())
    if r.read("Q") != _LIST_MAGIC:
        raise ValueError(f"{path}: not an MXNet NDArray file")
    r.read("Q")  # reserved
    n = r.read("Q")
    arrays = [_read_ndarray(r) for _ in range(n)]
    n_names = r.read("Q")
    if n_names != n:
        raise ValueError(f"{path}: {n} arrays but {n_names} names")
    names = [r.read_bytes(r.read("Q")).decode() for _ in range(n_names)]
    out = {}
    for name, arr in zip(names, arrays):
        if name.startswith(("arg:", "aux:")):
            name = name[4:]
        out[name] = arr
    return out


def write_mxnet_params(path: str, params: dict[str, np.ndarray]) -> None:
    """Write ``{name: array}`` in the V2 dense format (test fixture /
    round-trip support)."""
    chunks = [struct.pack("<QQQ", _LIST_MAGIC, 0, len(params))]
    names = list(params)
    for name in names:
        arr = np.ascontiguousarray(params[name])
        flag = _DTYPE_FLAGS.get(arr.dtype)
        if flag is None:
            raise ValueError(f"{name}: unsupported dtype {arr.dtype}")
        chunks.append(struct.pack("<IiI", _V2_MAGIC, 0, arr.ndim))
        chunks.append(struct.pack(f"<{arr.ndim}q", *arr.shape))
        chunks.append(struct.pack("<iii", 1, 0, flag))  # cpu(0) context
        chunks.append(arr.tobytes())
    chunks.append(struct.pack("<Q", len(names)))
    for name in names:
        enc = name.encode()
        chunks.append(struct.pack("<Q", len(enc)) + enc)
    with open(path, "wb") as fp:
        fp.write(b"".join(chunks))


# ---------------------------------------------------------------------------
# Gluon -> framework name/layout conversion
# ---------------------------------------------------------------------------

def map_key(mx_key: str) -> tuple[str, str]:
    """Gluon structural key -> (framework param path, weight kind).

    kind is 'conv' (NCHW conv / deform weight), 'deconv'
    (Conv2DTranspose weight) or 'bias'.
    """
    parts = [p for p in mx_key.split(".") if not p.isdigit()]
    scope = ""
    if parts and parts[0] == "MaskFlownet_S":
        scope = "MaskFlownet_S/"
        parts = parts[1:]
    if len(parts) != 2 or parts[1] not in ("weight", "bias"):
        raise ValueError(f"unrecognized Gluon parameter key {mx_key!r}")
    block, leaf = parts
    if leaf == "bias":
        return f"{scope}{block}/b", "bias"
    kind = "deconv" if block.startswith("upfeat") else "conv"
    return f"{scope}{block}/w", kind


def convert_array(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "bias":
        return arr.astype(np.float32)
    if arr.ndim != 4:
        raise ValueError(f"{kind} weight must be 4-D, got {arr.shape}")
    if kind == "conv":        # (Cout,Cin,kh,kw) -> (kh,kw,Cin,Cout)
        return np.transpose(arr, (2, 3, 1, 0)).astype(np.float32)
    if kind == "deconv":      # (Cin,Cout,kh,kw) -> flipped (kh,kw,Cin,Cout)
        w = np.transpose(arr, (2, 3, 0, 1))
        return np.ascontiguousarray(w[::-1, ::-1]).astype(np.float32)
    raise ValueError(kind)


def convert_params(mx_params: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Full Gluon dict -> framework flat param dict (no shape validation)."""
    out = {}
    for key, arr in mx_params.items():
        name, kind = map_key(key)
        out[name] = convert_array(arr, kind)
    return out


def permute_input_channels(params: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Reverse the image input channels of the first pyramid convs so a
    BGR-trained checkpoint computes the same function on RGB inputs (see
    module docstring). Affects ``conv1a/w`` (3-channel image input, both the
    standalone S network and the cascade's head scope) and the cascade's
    ``conv1x/w`` (4-channel input: image channels 0-2 reversed, the mask
    channel 3 untouched)."""
    out = dict(params)
    for key, arr in params.items():
        block = key.split("/")[-2]
        if key.endswith("/w") and block in ("conv1a", "conv1x"):
            w = arr.copy()                       # (kh, kw, cin, cout)
            w[:, :, 0:3] = arr[:, :, 2::-1]
            out[key] = w
    return out


def expected_param_shapes(network: str, deform_bias: bool = True):
    """Shape-infer the framework model's parameter tree (no FLOPs)."""
    import jax
    import jax.numpy as jnp

    from maskflownet_tpu import nn
    from maskflownet_tpu.models import ModelConfig, build_model

    cfg = ModelConfig(deform_bias=deform_bias)
    fwd = build_model(network)
    shapes: dict = {}

    def run(x):
        ctx = nn.Ctx(mode="shape", shapes=shapes)
        return fwd(ctx, x, x, cfg)

    jax.eval_shape(run, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    return {k: v[0] for k, v in shapes.items()}


def import_checkpoint(params_path: str, network: str = "MaskFlownet_S",
                      strict: bool = True,
                      input_channel_order: str = "rgb") -> dict[str, np.ndarray]:
    """Read + convert + validate an MXNet checkpoint against ``network``.

    Returns the framework param dict. ``strict`` requires exact coverage:
    every model parameter present, no unknown leftovers, shapes equal.
    ``input_channel_order='bgr'`` adapts a BGR-trained checkpoint to RGB
    inputs (see module docstring).
    """
    converted = convert_params(read_mxnet_params(params_path))
    if input_channel_order == "bgr":
        converted = permute_input_channels(converted)
    elif input_channel_order != "rgb":
        raise ValueError(f"input_channel_order {input_channel_order!r}")
    expected = expected_param_shapes(network)
    missing = sorted(set(expected) - set(converted))
    extra = sorted(set(converted) - set(expected))
    bad = sorted(k for k in set(expected) & set(converted)
                 if tuple(converted[k].shape) != tuple(expected[k]))
    if strict and (missing or extra or bad):
        msgs = []
        if missing:
            msgs.append(f"missing {len(missing)}: {missing[:5]}")
        if extra:
            msgs.append(f"unknown {len(extra)}: {extra[:5]}")
        if bad:
            msgs.append("shape mismatches: " + ", ".join(
                f"{k} {converted[k].shape}!={expected[k]}" for k in bad[:5]))
        raise ValueError(f"{params_path} vs {network}: " + "; ".join(msgs))
    return converted


def save_as_npz(params: dict[str, np.ndarray], out_path: str,
                step: int = 0) -> None:
    """Write a Trainer-compatible checkpoint (``p:``-prefixed params, no
    optimizer moments -- a fresh Adam state is correct for import-start
    fine-tunes; ``Trainer.load(load_states=True)`` skips absent moments)."""
    out = {"step": np.asarray(step)}
    for k, v in params.items():
        out["p:" + k] = v
    np.savez(out_path, **out)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("params", help="MXNet .params checkpoint")
    p.add_argument("out", help="output .npz checkpoint")
    p.add_argument("--network", default="MaskFlownet_S",
                   choices=["MaskFlownet_S", "MaskFlownet"])
    p.add_argument("--step", type=int, default=0)
    p.add_argument("--lenient", action="store_true",
                   help="allow partial coverage (still converts layouts)")
    p.add_argument("--input_channel_order", default="rgb",
                   choices=["rgb", "bgr"],
                   help="channel order the checkpoint was trained on; 'bgr' "
                        "permutes first-layer weights so the imported model "
                        "takes RGB input (reference KITTI/HD1K/Things3D "
                        "training data was cv2-BGR)")
    args = p.parse_args(argv)
    params = import_checkpoint(args.params, args.network,
                               strict=not args.lenient,
                               input_channel_order=args.input_channel_order)
    save_as_npz(params, args.out, step=args.step)
    print(f"wrote {len(params)} params to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
