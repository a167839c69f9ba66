"""Driver test for the mixed Sintel+KITTI+HD1K fine-tune branch — the most
complex dataset path in the reference driver (``main.py:220-268``): per-batch
fixed-ratio mixing (2 sintel : 1 kitti : 1 hd1k at batch 4 -> here 4:2:2 at
batch 8), resized auxiliary datasets, masked losses throughout."""

import os

import numpy as np
import pytest

from maskflownet_tpu.data import codecs


def _write_png8(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(str(path))


@pytest.fixture
def mixed_env(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)

    # --- sintel tree (native 436x1024 is too big for a test; the loader
    # only needs frames >= orig_shape, so use small frames and a small
    # orig_shape via the dataset config) ---
    sroot = tmp_path / "sintel"
    oh, ow = 436, 1024  # real sintel frame size: keep, but tiny count
    for subset in ("clean", "final"):
        d = sroot / "training" / subset / "alley_1"
        d.mkdir(parents=True)
        for i in (1, 2, 3):
            _write_png8(d / f"frame_{i:04d}.png",
                        rng.randint(0, 255, (oh, ow, 3), dtype=np.uint8))
    fd = sroot / "training" / "flow" / "alley_1"
    vd = sroot / "training" / "invalid" / "alley_1"
    fd.mkdir(parents=True)
    vd.mkdir(parents=True)
    for i in (1, 2):
        codecs.flo_save((rng.randn(oh, ow, 2) * 3).astype(np.float32),
                        str(fd / f"frame_{i:04d}.flo"))
        _write_png8(vd / f"frame_{i:04d}.png",
                    (rng.randint(0, 2, (oh, ow)) * 255).astype(np.uint8))
    (sroot / "test" / "clean").mkdir(parents=True)
    (sroot / "test" / "final").mkdir(parents=True)
    split = sroot / "split.txt"
    # 4 training pairs (clean+final x 2): alternate train1/train2
    np.savetxt(str(split), np.array([1, 2, 1, 2]), fmt="%d")

    # --- kitti 2015 tree ---
    kroot = tmp_path / "kitti"
    idir = kroot / "2015" / "training" / "image_2"
    fdir = kroot / "2015" / "training" / "flow_occ"
    idir.mkdir(parents=True)
    fdir.mkdir(parents=True)
    for k in range(4):
        for suff in ("10", "11"):
            _write_png8(idir / f"{k:06d}_{suff}.png",
                        rng.randint(0, 255, (180, 500, 3), dtype=np.uint8))
        codecs.png16_save(codecs.kitti_flow_encode(
            (rng.randn(180, 500, 2) * 5).astype(np.float32)),
            str(fdir / f"{k:06d}_10.png"))

    # --- hd1k tree ---
    hroot = tmp_path / "hd1k"
    hi = hroot / "hd1k_input" / "image_2"
    hf = hroot / "hd1k_flow_gt" / "flow_occ"
    hi.mkdir(parents=True)
    hf.mkdir(parents=True)
    for seq in (0, 1):
        for j in range(3):
            _write_png8(hi / ("%06d_%04d.png" % (seq, j)),
                        rng.randint(0, 255, (300, 600, 3), dtype=np.uint8))
            codecs.png16_save(codecs.kitti_flow_encode(
                (rng.randn(300, 600, 2) * 5).astype(np.float32)),
                str(hf / ("%06d_%04d.png" % (seq, j))))

    monkeypatch.setenv("MFN_SINTEL_ROOT", str(sroot))
    monkeypatch.setenv("MFN_SINTEL_SPLIT", str(split))
    monkeypatch.setenv("MFN_KITTI_ROOT", str(kroot))
    monkeypatch.setenv("MFN_HD1K_ROOT", str(hroot))

    net_yaml = tmp_path / "net.yaml"
    net_yaml.write_text(
        "network:\n  class: MaskFlownet_S\n"
        "optimizer:\n  q: 0.4\n  learning_rate:\n    - [2, 5.0e-5]\n")
    ds_yaml = tmp_path / "ds.yaml"
    ds_yaml.write_text(
        "dataset: sintel\nkitti: 2\nhd1k: 2\n"
        "validation_steps: 2\ncheckpoint_steps: 2\n"
        "target_shape: [64, 128]\nresize_shape: 436\n")
    root = tmp_path / "exp"
    root.mkdir()
    return str(net_yaml), str(ds_yaml), str(root)


@pytest.mark.xslow
def test_cli_sintel_mixed_training(mixed_env):
    net_yaml, ds_yaml, root = mixed_env
    from maskflownet_tpu.cli.main import main
    rc = main([net_yaml, "--dataset_cfg", ds_yaml, "--debug", "--batch", "8",
               "--root", root, "--compute_dtype", "float32"])
    assert rc == 0
    logs = [f for f in os.listdir(os.path.join(root, "logs", "debug"))
            if f.endswith(".log")]
    text = open(os.path.join(root, "logs", "debug", logs[0])).read()
    assert "steps=2" in text
    assert "sintel." in text  # validation over the training2 split ran
