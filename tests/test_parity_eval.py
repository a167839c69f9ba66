"""Plumbing test for the one-command acceptance harness
(tools/parity_eval.py, VERDICT r3 task #2): a synthetic Gluon .params
checkpoint + fixture-scale Sintel/KITTI trees run through import ->
validation -> table/verdict end-to-end. Real-data numbers are exercised the
moment real roots mount; this pins everything up to that point."""

import json
import os

import numpy as np
import pytest

from maskflownet_tpu.data import codecs
from maskflownet_tpu.tools import import_mxnet as imx
from maskflownet_tpu.tools import parity_eval

from test_import_mxnet import _gluon_checkpoint_for  # noqa: F401

SH, SW = 64, 128        # fixture sintel frame size (native is 436x1024)


def _write_png8(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(str(path))


@pytest.fixture
def eval_trees(tmp_path, monkeypatch):
    rng = np.random.RandomState(7)
    # sintel: one sequence, 3 frames, clean+final, train1/train2 split
    sroot = tmp_path / "sintel"
    for subset in ("clean", "final"):
        d = sroot / "training" / subset / "alley_1"
        d.mkdir(parents=True)
        for i in (1, 2, 3):
            _write_png8(d / f"frame_{i:04d}.png",
                        rng.randint(0, 255, (SH, SW, 3), dtype=np.uint8))
    fd = sroot / "training" / "flow" / "alley_1"
    vd = sroot / "training" / "invalid" / "alley_1"
    fd.mkdir(parents=True)
    vd.mkdir(parents=True)
    for i in (1, 2):
        codecs.flo_save((rng.randn(SH, SW, 2) * 2).astype(np.float32),
                        str(fd / f"frame_{i:04d}.flo"))
        _write_png8(vd / f"frame_{i:04d}.png",
                    np.zeros((SH, SW), np.uint8))      # all valid
    split = sroot / "split.txt"
    np.savetxt(str(split), np.array([1, 2, 1, 2]), fmt="%d")
    # the sintel flo codec validates the native frame size; fixture frames
    # are small, so align the module constant for the test's duration
    monkeypatch.setattr("maskflownet_tpu.data.sintel.SHAPE", (SH, SW))

    # kitti 2012+2015 trees, 2 pairs each
    kroot = tmp_path / "kitti"
    for ed, idirname in (("2012", "colored_0"), ("2015", "image_2")):
        idir = kroot / ed / "training" / idirname
        fdir = kroot / ed / "training" / "flow_occ"
        idir.mkdir(parents=True)
        fdir.mkdir(parents=True)
        for k in range(2):
            for suff in ("10", "11"):
                _write_png8(idir / f"{k:06d}_{suff}.png",
                            rng.randint(0, 255, (SH, SW, 3), dtype=np.uint8))
            codecs.png16_save(codecs.kitti_flow_encode(
                (rng.randn(SH, SW, 2) * 3).astype(np.float32)),
                str(fdir / f"{k:06d}_10.png"))
    return sroot, split, kroot


@pytest.mark.slow
def test_parity_eval_end_to_end(tmp_path, eval_trees, capsys):
    sroot, split, kroot = eval_trees
    # a real .params file through the real importer (random weights)
    gluon, _ = _gluon_checkpoint_for("MaskFlownet_S")
    # full-scale randn weights explode through 30+ convs (NaN); shrink to a
    # stable random model -- the harness is about plumbing, not accuracy
    gluon = {k: v * 0.02 for k, v in gluon.items()}
    ck = str(tmp_path / "dbbSep30-1206_1000000.params")
    imx.write_mxnet_params(ck, gluon)

    summary = parity_eval.run(
        ck, batch_size=2, samples=2,
        sintel_root=str(sroot), sintel_split=str(split),
        kitti_root=str(kroot), kitti_resize=(SW, SH))
    out = capsys.readouterr().out

    # network + expectation auto-detected from the filename
    assert summary["network"] == "MaskFlownet_S"
    assert summary["expect"] == "dbbSep30"
    # dbbSep30 publishes no trainval row -> must not be evaluated
    assert not any(k.startswith("sintel.trainval") for k in summary["results"])
    # all four published rows computed (nothing skipped on a full mount)
    for key in ("sintel.val.clean", "sintel.val.final", "kitti.2012.epe",
                "kitti.2012.fl", "kitti.2015.epe", "kitti.2015.fl"):
        assert key in summary["results"], key
        assert np.isfinite(summary["results"][key])
        assert key in summary["verdicts"]
    # random weights vs published numbers: the harness must FAIL loudly
    assert summary["status"] == "fail" and summary["n_fail"] > 0
    assert "FAIL" in out
    # the printed summary line is machine-readable
    parsed = json.loads(out.strip().splitlines()[-1])
    assert parsed["n_fail"] == summary["n_fail"]


@pytest.mark.slow
def test_parity_eval_cascade_end_to_end(tmp_path, eval_trees, capsys):
    """The flagship-cascade flavor of the harness (VERDICT r4 #7): a
    5adNov03-shaped ``.params`` file through importer -> full MaskFlownet
    cascade -> the published-row table. 5adNov03 is the reference's
    headline checkpoint (/root/reference/weights/README.md:19)."""
    sroot, split, kroot = eval_trees
    gluon, _ = _gluon_checkpoint_for("MaskFlownet")
    gluon = {k: v * 0.02 for k, v in gluon.items()}
    ck = str(tmp_path / "5adNov03-0005_1000000.params")
    imx.write_mxnet_params(ck, gluon)

    summary = parity_eval.run(
        ck, batch_size=2, samples=2,
        sintel_root=str(sroot), sintel_split=str(split),
        kitti_root=str(kroot), kitti_resize=(SW, SH))
    out = capsys.readouterr().out

    # cascade network + expectation auto-detected from the filename
    assert summary["network"] == "MaskFlownet"
    assert summary["expect"] == "5adNov03"
    # 5adNov03 publishes no trainval row -> must not be evaluated
    assert not any(k.startswith("sintel.trainval") for k in summary["results"])
    for key in ("sintel.val.clean", "sintel.val.final", "kitti.2012.epe",
                "kitti.2012.fl", "kitti.2015.epe", "kitti.2015.fl"):
        assert key in summary["results"], key
        assert np.isfinite(summary["results"][key])
        assert key in summary["verdicts"]
    # random weights vs published numbers: must FAIL loudly
    assert summary["status"] == "fail" and summary["n_fail"] > 0
    parsed = json.loads(out.strip().splitlines()[-1])
    assert parsed["network"] == "MaskFlownet"


@pytest.mark.slow
def test_parity_eval_skips_missing_mounts(tmp_path, eval_trees):
    sroot, split, _ = eval_trees
    gluon, _ = _gluon_checkpoint_for("MaskFlownet_S")
    ck = str(tmp_path / "ck.params")
    imx.write_mxnet_params(ck, gluon)
    # no kitti root: those rows skip, sintel still computes, rc semantics
    summary = parity_eval.run(
        ck, expect="dbbSep30", batch_size=2, samples=2,
        sintel_root=str(sroot), sintel_split=str(split),
        kitti_root=str(tmp_path / "nope"))
    assert set(summary["skipped"]) == {"kitti.2012", "kitti.2015"}
    assert "sintel.val.clean" in summary["results"]
    # nothing at all mounted -> status no-data, CLI exit code 2
    summary2 = parity_eval.run(
        ck, expect="dbbSep30", batch_size=2, samples=2,
        sintel_root=str(tmp_path / "nope"),
        sintel_split=str(tmp_path / "nope.txt"),
        kitti_root=str(tmp_path / "nope"))
    assert summary2["status"] == "no-data"


def test_parity_eval_cli_surface(tmp_path):
    # unknown checkpoint name + --expect none + explicit network: builds the
    # argparse path; data roots absent -> exit 2 (nothing computable)
    gluon, _ = _gluon_checkpoint_for("MaskFlownet_S")
    ck = str(tmp_path / "mystery.params")
    imx.write_mxnet_params(ck, gluon)
    rc = parity_eval.main([
        ck, "--expect", "none", "--network", "MaskFlownet_S",
        "--samples", "1", "--batch", "1",
        "--sintel_root", str(tmp_path / "x"),
        "--sintel_split", str(tmp_path / "x.txt"),
        "--kitti_root", str(tmp_path / "x")])
    assert rc == 2
