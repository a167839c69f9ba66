"""End-to-end driver test: the reference README smoke test equivalent
(``python main.py ... --debug``) against a synthetic FlyingChairs tree,
running the full CLI path -- config load, run registry, Trainer, loaders,
prefetcher, train loop, validation, checkpoint rotation, schedule exit."""

import os

import numpy as np
import pytest

from maskflownet_tpu.data import codecs


@pytest.fixture
def chairs_env(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    data_dir = tmp_path / "chairs"
    data_dir.mkdir()
    n = 6
    for i in range(1, n + 1):
        for j in (1, 2):
            img = rng.randint(0, 255, (384, 512, 3), dtype=np.uint8)
            with open(str(data_dir / ("%05d_img%d.ppm" % (i, j))), "wb") as fp:
                fp.write(b"P6 512 384 255\n" + img.tobytes())
        flow = (rng.randn(384, 512, 2) * 3).astype(np.float32)
        codecs.flo_save(flow, str(data_dir / ("%05d_flow.flo" % i)))
    split = tmp_path / "split.txt"
    with open(str(split), "w") as fp:
        fp.write("1\n1\n1\n1\n2\n2\n")
    monkeypatch.setenv("MFN_CHAIRS_DIR", str(data_dir))
    monkeypatch.setenv("MFN_CHAIRS_SPLIT", str(split))
    monkeypatch.setenv("MFN_SINTEL_ROOT", str(tmp_path / "nosintel"))

    net_yaml = tmp_path / "net.yaml"
    net_yaml.write_text(
        "network:\n  class: MaskFlownet_S\n"
        "optimizer:\n  learning_rate:\n    - [4, 1.0e-4]\n")
    ds_yaml = tmp_path / "ds.yaml"
    ds_yaml.write_text(
        "dataset: chairs\nvalidation_steps: 2\ncheckpoint_steps: 2\n"
        "target_shape: [64, 128]\norig_shape: [96, 160]\n")
    root = tmp_path / "exp"
    root.mkdir()
    return str(net_yaml), str(ds_yaml), str(root)


@pytest.mark.xslow
def test_cli_debug_training_end_to_end(chairs_env):
    net_yaml, ds_yaml, root = chairs_env
    from maskflownet_tpu.cli.main import main
    rc = main([net_yaml, "--dataset_cfg", ds_yaml, "--debug", "--batch", "8",
               "--root", root, "--compute_dtype", "float32"])
    assert rc == 0
    # a checkpoint was written and the log recorded training steps
    weights = os.listdir(os.path.join(root, "weights"))
    assert any(w.endswith(".npz") for w in weights), weights
    logs = [f for f in os.listdir(os.path.join(root, "logs", "debug"))
            if f.endswith(".log")]
    assert logs
    text = open(os.path.join(root, "logs", "debug", logs[0])).read()
    assert "steps=4" in text
    assert "chairs" in text  # validation ran


@pytest.mark.xslow
def test_cli_resume_from_checkpoint(chairs_env):
    """-c RUNID resumes: finds the log + latest checkpoint by regex
    (non-debug run: resume resolution reads logs/, like the reference)."""
    net_yaml, ds_yaml, root = chairs_env
    from maskflownet_tpu.cli.main import main
    rc = main([net_yaml, "--dataset_cfg", ds_yaml, "--batch", "8",
               "--root", root, "--compute_dtype", "float32"])
    assert rc == 0
    logs = [f for f in os.listdir(os.path.join(root, "logs"))
            if f.endswith(".log")]
    run_id = logs[0][:-4]
    # resume: schedule already exhausted -> exits after loading state
    rc = main([net_yaml, "--dataset_cfg", ds_yaml, "--batch", "8",
               "--root", root, "--compute_dtype", "float32",
               "-c", run_id[:3]])
    assert rc == 0


@pytest.mark.xslow
def test_cli_device_cache_with_device_aug(chairs_env):
    """The flagship throughput path: --device_cache N (HBM-resident raw
    batches, background refresh) with --aug auto resolving to 'device'
    (crop/affine/color drawn inside the jitted step, so echoed batches get
    fresh geometry). End-to-end through the CLI."""
    net_yaml, ds_yaml, root = chairs_env
    from maskflownet_tpu.cli.main import main, parse_args

    args = parse_args([net_yaml, "--device_cache", "2"])
    assert args.aug == "device"          # auto resolution
    args = parse_args([net_yaml])
    assert args.aug == "host"

    rc = main([net_yaml, "--dataset_cfg", ds_yaml, "--debug", "--batch", "8",
               "--root", root, "--compute_dtype", "float32",
               "--device_cache", "2"])
    assert rc == 0
    weights = os.listdir(os.path.join(root, "weights"))
    assert any(w.endswith(".npz") for w in weights), weights
    logs = [f for f in os.listdir(os.path.join(root, "logs", "debug"))
            if f.endswith(".log")]
    text = open(os.path.join(root, "logs", "debug", logs[0])).read()
    assert "steps=4" in text
    assert "aug='device'" in text        # args logged with the resolved aug
