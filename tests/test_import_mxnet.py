"""MXNet checkpoint importer: file-format round-trip, Gluon name mapping,
layout-transform numerical equivalence, full-model coverage."""

import numpy as np
import pytest

import jax.numpy as jnp

from maskflownet_tpu import nn
from maskflownet_tpu.tools import import_mxnet as imx

rng = np.random.RandomState(7)


def test_params_file_roundtrip(tmp_path):
    data = {
        "conv1a.0.weight": rng.randn(16, 3, 3, 3).astype(np.float32),
        "conv1a.0.bias": rng.randn(16).astype(np.float32),
        "some.float16": rng.randn(4, 5).astype(np.float16),
        "an.int64": np.arange(6, dtype=np.int64).reshape(2, 3),
        "scalarish": rng.randn(1).astype(np.float32),
    }
    path = str(tmp_path / "x.params")
    imx.write_mxnet_params(path, data)
    back = imx.read_mxnet_params(path)
    assert set(back) == set(data)
    for k in data:
        assert back[k].dtype == data[k].dtype
        np.testing.assert_array_equal(back[k], data[k])


def test_read_strips_arg_prefix(tmp_path):
    path = str(tmp_path / "x.params")
    imx.write_mxnet_params(path, {"arg:conv1a.0.weight":
                                  np.zeros((2, 2, 3, 3), np.float32)})
    assert list(imx.read_mxnet_params(path)) == ["conv1a.0.weight"]


def test_map_key():
    assert imx.map_key("conv1a.0.weight") == ("conv1a/w", "conv")
    assert imx.map_key("conv1a.0.bias") == ("conv1a/b", "bias")
    assert imx.map_key("pred_flow6.weight") == ("pred_flow6/w", "conv")
    assert imx.map_key("deform5.weight") == ("deform5/w", "conv")
    assert imx.map_key("upfeat5.0.weight") == ("upfeat5/w", "deconv")
    assert imx.map_key("MaskFlownet_S.conv2f.0.bias") == \
        ("MaskFlownet_S/conv2f/b", "bias")
    assert imx.map_key("MaskFlownet_S.upfeat2.0.weight") == \
        ("MaskFlownet_S/upfeat2/w", "deconv")
    with pytest.raises(ValueError):
        imx.map_key("weird.thing.extra.weight")


def _np_conv_nchw(x, w, stride=1, pad=1):
    """Direct NCHW conv (Cout,Cin,kh,kw), the MXNet Conv2D semantics."""
    n, cin, h, wd = x.shape
    cout, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((n, cout, oh, ow), np.float32)
    for y in range(oh):
        for xx in range(ow):
            patch = xp[:, :, y * stride:y * stride + kh,
                       xx * stride:xx * stride + kw]
            out[:, :, y, xx] = np.einsum("nchw,ochw->no", patch, w)
    return out


def _np_deconv_nchw(x, w, stride=2, pad=1):
    """Direct NCHW transposed conv with MXNet Deconvolution weight layout
    (Cin,Cout,kh,kw): scatter each input pixel through the kernel."""
    n, cin, h, wd = x.shape
    _, cout, kh, kw = w.shape
    oh, ow = (h - 1) * stride - 2 * pad + kh, (wd - 1) * stride - 2 * pad + kw
    full = np.zeros((n, cout, (h - 1) * stride + kh, (wd - 1) * stride + kw),
                    np.float32)
    for y in range(h):
        for xx in range(wd):
            contrib = np.einsum("nc,cokl->nokl", x[:, :, y, xx], w)
            full[:, :, y * stride:y * stride + kh,
                 xx * stride:xx * stride + kw] += contrib
    return full[:, :, pad:pad + oh, pad:pad + ow]


def test_conv_weight_transform_matches_mxnet_semantics():
    x = rng.randn(2, 5, 6, 7).astype(np.float32)          # NCHW
    w = rng.randn(4, 5, 3, 3).astype(np.float32)          # OIHW
    b = rng.randn(4).astype(np.float32)
    ref = _np_conv_nchw(x, w) + b[None, :, None, None]

    params = {"c/w": jnp.asarray(imx.convert_array(w, "conv")),
              "c/b": jnp.asarray(b)}
    ctx = nn.apply_ctx(params)
    got = nn.conv(ctx, "c", jnp.asarray(x.transpose(0, 2, 3, 1)), 4,
                  act=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_deconv_weight_transform_matches_mxnet_semantics():
    x = rng.randn(2, 5, 4, 6).astype(np.float32)          # NCHW
    w = rng.randn(5, 3, 4, 4).astype(np.float32)          # (Cin,Cout,kh,kw)
    b = rng.randn(3).astype(np.float32)
    ref = _np_deconv_nchw(x, w) + b[None, :, None, None]

    params = {"d/w": jnp.asarray(imx.convert_array(w, "deconv")),
              "d/b": jnp.asarray(b)}
    ctx = nn.apply_ctx(params)
    got = nn.deconv(ctx, "d", jnp.asarray(x.transpose(0, 2, 3, 1)), 3,
                    act=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def _gluon_checkpoint_for(network):
    """Synthesize a Gluon-named .params dict covering the full model, with
    MXNet layouts, from the framework's shape inference."""
    expected = imx.expected_param_shapes(network)
    out = {}
    for name, shape in expected.items():
        scope = ""
        if name.startswith("MaskFlownet_S/"):
            scope = "MaskFlownet_S."
            name = name[len("MaskFlownet_S/"):]
        block, leaf = name.split("/")
        seq = "" if (block.startswith(("pred_", "deform")) or
                     block == "dc_conv7") else "0."
        if leaf == "b":
            out[f"{scope}{block}.{seq}bias"] = \
                rng.randn(*shape).astype(np.float32)
        elif block.startswith("upfeat"):
            kh, kw, cin, cout = shape
            out[f"{scope}{block}.{seq}weight"] = \
                rng.randn(cin, cout, kh, kw).astype(np.float32)
        else:
            kh, kw, cin, cout = shape
            out[f"{scope}{block}.{seq}weight"] = \
                rng.randn(cout, cin, kh, kw).astype(np.float32)
    return out, expected


@pytest.mark.parametrize("network", ["MaskFlownet_S", "MaskFlownet"])
def test_import_full_model_coverage(tmp_path, network):
    gluon, expected = _gluon_checkpoint_for(network)
    path = str(tmp_path / "ck.params")
    imx.write_mxnet_params(path, gluon)
    params = imx.import_checkpoint(path, network)
    assert set(params) == set(expected)
    for k, v in params.items():
        assert tuple(v.shape) == tuple(expected[k]), k


def test_import_strict_rejects_missing_and_extra(tmp_path):
    gluon, _ = _gluon_checkpoint_for("MaskFlownet_S")
    gone = next(iter(gluon))
    del gluon[gone]
    gluon["mystery.weight"] = np.zeros((1, 1, 3, 3), np.float32)
    path = str(tmp_path / "bad.params")
    imx.write_mxnet_params(path, gluon)
    with pytest.raises(ValueError, match="missing"):
        imx.import_checkpoint(path, "MaskFlownet_S")
    # lenient mode converts what it can
    got = imx.import_checkpoint(path, "MaskFlownet_S", strict=False)
    assert "mystery/w" in got


def test_cli_writes_trainer_npz(tmp_path):
    gluon, expected = _gluon_checkpoint_for("MaskFlownet_S")
    src = str(tmp_path / "ck.params")
    dst = str(tmp_path / "ck.npz")
    imx.write_mxnet_params(src, gluon)
    assert imx.main([src, dst, "--network", "MaskFlownet_S",
                     "--step", "123"]) == 0
    z = np.load(dst)
    assert int(z["step"]) == 123
    assert {k[2:] for k in z if k.startswith("p:")} == set(expected)
