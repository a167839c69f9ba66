"""Export/inference tool tests: Sintel .flo + KITTI PNG submission writers
and the standalone inference tool, against synthetic dataset trees and a
freshly initialized model."""

import os

import numpy as np
import pytest

from maskflownet_tpu.data import codecs
from maskflownet_tpu.models import ModelConfig
from maskflownet_tpu.parallel import make_mesh
from maskflownet_tpu.training import Trainer, TrainSettings


@pytest.fixture(scope="module")
def trainer():
    s = TrainSettings(model="MaskFlownet_S", model_cfg=ModelConfig(),
                      compute_dtype="float32", target_shape=(64, 128),
                      orig_shape=(64, 128), geo=None, color=None)
    return Trainer(s, mesh=make_mesh(), init_shape=(64, 128))


def _write_png8(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def test_sintel_submission_writer(tmp_path, monkeypatch, trainer):
    rng = np.random.RandomState(0)
    root = tmp_path / "sintel"
    for subset in ("clean", "final"):
        d = root / "test" / subset / "seq_1"
        d.mkdir(parents=True)
        for i in (1, 2, 3):
            _write_png8(str(d / f"frame_{i:04d}.png"),
                        rng.randint(0, 255, (40, 60, 3), dtype=np.uint8))
    (root / "training" / "clean").mkdir(parents=True)
    (root / "training" / "final").mkdir(parents=True)
    monkeypatch.setenv("MFN_SINTEL_ROOT", str(root))
    monkeypatch.setenv("MFN_SINTEL_SPLIT", str(root / "nosplit.txt"))

    from maskflownet_tpu.tools import submission
    out = str(tmp_path / "flows")
    submission.predict_sintel(trainer, out, batch_size=2, resize=(64, 128))
    flo_files = []
    for base, _, files in os.walk(out):
        flo_files += [os.path.join(base, f) for f in files if f.endswith(".flo")]
    assert len(flo_files) == 2  # final pass only, 2 consecutive pairs
    f = codecs.flo_load(flo_files[0])
    assert f.shape == (40, 60, 2)
    assert np.isfinite(f).all()


def test_kitti_submission_writer(tmp_path, monkeypatch, trainer):
    rng = np.random.RandomState(1)
    root = tmp_path / "kitti"
    for ed, sub in (("2012", "colored_0"), ("2015", "image_2")):
        d = root / ed / "testing" / sub
        d.mkdir(parents=True)
        for k in range(3):
            for suff in ("10", "11"):
                _write_png8(str(d / f"{k:06d}_{suff}.png"),
                            rng.randint(0, 255, (40, 60, 3), dtype=np.uint8))
    monkeypatch.setenv("MFN_KITTI_ROOT", str(root))

    from maskflownet_tpu.tools import submission
    out = str(tmp_path / "kflows")
    submission.predict_kitti(trainer, out, batch_size=2, resize=(64, 128))
    for ed in ("2012", "2015"):
        files = sorted(os.listdir(os.path.join(out, "kitti_" + ed)))
        assert len(files) == 2  # (len(listdir)-1)//2 = (6-1)//2
        dec, occ = codecs.kitti_flow_decode(
            codecs.png16_load(os.path.join(out, "kitti_" + ed, files[0])))
        assert dec.shape == (40, 60, 2)
        assert (occ == 1).all()


def test_infer_image_pair(tmp_path, trainer, monkeypatch):
    """Image-pair inference through the tools API, plus flow visualization."""
    rng = np.random.RandomState(2)
    from maskflownet_tpu.tools.infer import predict_image_pair_flow
    from maskflownet_tpu.tools.flow_vis import flow_to_color
    img1 = rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)
    img2 = rng.randint(0, 255, (50, 70, 3), dtype=np.uint8)
    flow, occ, warped = predict_image_pair_flow(trainer, img1, img2,
                                                resize=(64, 128))
    assert flow.shape == (50, 70, 2)
    vis = flow_to_color(flow)
    assert vis.shape == (50, 70, 3) and vis.dtype == np.uint8


def test_infer_cli_end_to_end(tmp_path, trainer):
    """The infer CLI: checkpoint load + pair -> flo/png outputs on disk."""
    ck = str(tmp_path / "ck")
    trainer.save(ck)
    rng = np.random.RandomState(3)
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    _write_png8(a, rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    _write_png8(b, rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    out = str(tmp_path / "out")
    from maskflownet_tpu.tools.infer import main
    rc = main(["MaskFlownet_S.yaml", "-c", ck + ".npz", "-i", a, b,
               "-o", out, "--resize", "64,128"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "flow.flo"))
    assert os.path.exists(os.path.join(out, "flow.png"))
    assert os.path.exists(os.path.join(out, "warped.png"))


def test_infer_video_mode(tmp_path, trainer):
    """Video in -> flow-visualization video out (reference
    ``predict_new_data.py:100-162`` parity), via synthetic cv2 frames."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(4)
    vin = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vin, cv2.VideoWriter_fourcc(*"mp4v"), 12.0, (64, 48))
    assert w.isOpened()
    for _ in range(5):
        w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    from maskflownet_tpu.tools.infer import (predict_video_flow, read_video,
                                             write_video)
    frames, fps = read_video(vin)
    assert len(frames) == 5 and abs(fps - 12.0) < 0.5
    assert frames[0].shape == (48, 64, 3)

    vout = str(tmp_path / "out.mp4")
    n = predict_video_flow(trainer, vin, vout, resize=(64, 128), batch_size=2)
    assert n == 4
    back, fps2 = read_video(vout)
    assert len(back) == 4 and abs(fps2 - 12.0) < 0.5
    assert back[0].shape == (48, 64, 3)

    # round-trip of the writer alone (lossy codec: just shape/count)
    write_video(str(tmp_path / "rt.avi"), frames, fps)
    rt, _ = read_video(str(tmp_path / "rt.avi"))
    assert len(rt) == 5


def test_flow_vis_properties():
    from maskflownet_tpu.tools.flow_vis import flow_to_color
    flow = np.zeros((10, 10, 2), np.float32)
    img = flow_to_color(flow)
    # zero flow renders (near-)white
    assert (img > 240).all()
    flow[..., 1] = 10.0
    img2 = flow_to_color(flow)
    assert not np.array_equal(img, img2)
