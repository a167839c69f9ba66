"""Checkpoint-parity proof: MXNet ``.params`` -> importer -> framework
forward reproduces the reference forward (the numpy oracle in
``tests/oracle_mxnet.py``), for both networks.

This converts "the importer exists" into "imported checkpoints provably
compute the reference function" without needing the (unmounted) published
weights: random Gluon-format checkpoints are generated, written in the real
MXNet NDArray-list file format, imported through
``maskflownet_tpu.tools.import_mxnet``, and the framework forward is
compared against the oracle transliteration of the reference
(``/root/reference/network/MaskFlownet.py:197-315,443-545``).

Also settles the deform offset-layout question (see oracle docstring): the
reference's ``expand_dims -> repeat 9 -> reshape((0,-3,-2))`` produces the
clean per-tap (dy, dx) layout, so the framework's native rigid-window
semantics ARE the reference semantics and no compat mode is needed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maskflownet_tpu import nn as fnn
from maskflownet_tpu.models import ModelConfig, build_model
from maskflownet_tpu.tools.import_mxnet import (expected_param_shapes,
                                                import_checkpoint,
                                                write_mxnet_params)

import oracle_mxnet as oracle

rng = np.random.RandomState(7)


def make_gluon_params(network: str) -> dict:
    """Random parameters in the *Gluon* naming/layout convention, shaped to
    match the framework's expected tree (He-ish scale so activations stay
    finite through ~40 layers)."""
    shapes = expected_param_shapes(network)
    out = {}
    for key, shp in sorted(shapes.items()):
        scope, name = "", key
        if name.startswith("MaskFlownet_S/"):
            scope = "MaskFlownet_S."
            name = name[len("MaskFlownet_S/"):]
        block, leaf = name.split("/")
        # reference block structure: conv/deconv factories wrap the op in a
        # Sequential (child index 0); predict_flow/predict_mask/dc_conv7 and
        # DeformableConv2D are bare blocks (MaskFlownet.py:166-191,155-158)
        bare = block.startswith(("pred_", "deform")) or block == "dc_conv7"
        gk = scope + block + ("." if bare else ".0.") + \
            ("weight" if leaf == "w" else "bias")
        if leaf == "b":
            arr = rng.randn(*shp) * 0.05
        elif block.startswith("upfeat"):
            kh, kw, cin, cout = shp      # gluon Conv2DTranspose layout
            arr = rng.randn(cin, cout, kh, kw) / np.sqrt(kh * kw * cin)
        else:
            kh, kw, cin, cout = shp      # gluon Conv2D/deform layout
            arr = rng.randn(cout, cin, kh, kw) / np.sqrt(kh * kw * cin)
        out[gk] = arr.astype(np.float32)
    return out


def framework_forward(network, params_np, im1_nchw, im2_nchw, **cfg_kw):
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    cfg = ModelConfig(**cfg_kw)
    fwd = build_model(network)
    im1 = jnp.asarray(im1_nchw.transpose(0, 2, 3, 1), jnp.float32)
    im2 = jnp.asarray(im2_nchw.transpose(0, 2, 3, 1), jnp.float32)

    ctx = fnn.apply_ctx(params, compute_dtype=jnp.float32)
    preds, masks = jax.jit(
        lambda a, b: fwd(ctx, a, b, cfg)[:2])(im1, im2)
    return ([np.asarray(p).transpose(0, 3, 1, 2) for p in preds],
            [np.asarray(m).transpose(0, 3, 1, 2) for m in masks])


@pytest.fixture(scope="module")
def images():
    im1 = rng.rand(1, 3, 64, 128).astype(np.float32) - 0.5
    im2 = rng.rand(1, 3, 64, 128).astype(np.float32) - 0.5
    return im1, im2


@pytest.fixture(scope="module")
def s_setup(tmp_path_factory):
    gluon = make_gluon_params("MaskFlownet_S")
    path = str(tmp_path_factory.mktemp("mx") / "s.params")
    write_mxnet_params(path, gluon)
    imported = import_checkpoint(path, "MaskFlownet_S", strict=True)
    return gluon, imported


def test_parity_maskflownet_s(images, s_setup):
    im1, im2 = images
    gluon, imported = s_setup
    o_preds, o_masks, _ = oracle.maskflownet_s_forward(gluon, im1, im2)
    f_preds, f_masks = framework_forward("MaskFlownet_S", imported, im1, im2)
    assert len(f_preds) == len(o_preds) == 5
    for i, (op, fp) in enumerate(zip(o_preds, f_preds)):
        err = np.max(np.abs(op - fp))
        scale = max(1.0, np.max(np.abs(op)))
        assert err / scale < 2e-5, (i, err, scale)
    err = np.max(np.abs(o_masks[0] - f_masks[0]))
    assert err < 2e-5, err


def test_parity_maskflownet_cascade(images, tmp_path):
    im1, im2 = images
    gluon = make_gluon_params("MaskFlownet")
    path = str(tmp_path / "full.params")
    write_mxnet_params(path, gluon)
    imported = import_checkpoint(path, "MaskFlownet", strict=True)
    o_preds, o_vis, _ = oracle.maskflownet_forward(gluon, im1, im2)
    f_preds, f_vis = framework_forward("MaskFlownet", imported, im1, im2)
    assert len(f_preds) == len(o_preds) == 5
    for i, (op, fp) in enumerate(zip(o_preds, f_preds)):
        err = np.max(np.abs(op - fp))
        scale = max(1.0, np.max(np.abs(op)))
        assert err / scale < 2e-5, (i, err, scale)
    # visuals[0] is flow2 channel 0, internal (pre-scale) units in both
    # implementations (MaskFlownet.py:543-545)
    err = np.max(np.abs(o_vis[0] - f_vis[0]))
    assert err / max(1.0, np.max(np.abs(o_vis[0]))) < 2e-5, err


def test_bgr_import_channel_permutation(images, s_setup):
    """``input_channel_order='bgr'``: importing a BGR-trained checkpoint for
    RGB inputs must equal running the original checkpoint on BGR images.
    (The reference reads KITTI/HD1K/Things3D via cv2 => BGR, but
    chairs (own PPM codec) and Sintel (skimage) => RGB; see import_mxnet
    docstring.)"""
    im1, im2 = images
    gluon, _ = s_setup
    from maskflownet_tpu.tools.import_mxnet import convert_params, \
        permute_input_channels
    imported_bgr = permute_input_channels(convert_params(gluon))
    # oracle consumes the *original* weights with channel-reversed images
    o_preds, _, _ = oracle.maskflownet_s_forward(
        gluon, im1[:, ::-1], im2[:, ::-1])
    f_preds, _ = framework_forward("MaskFlownet_S", imported_bgr, im1, im2)
    for op, fp in zip(o_preds, f_preds):
        err = np.max(np.abs(op - fp))
        assert err / max(1.0, np.max(np.abs(op))) < 2e-5, err
