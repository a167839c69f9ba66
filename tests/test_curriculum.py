"""The reference's central workflow, composed end-to-end through the CLI:
the 4-stage curriculum (``/root/reference/main.py:126-143`` +
``network/config/*.yaml``) at debug scale on fixture data.

  stage 1  chairs pretrain (MaskFlownet_S)                MaskFlownet_S.yaml
           (run non-debug: resume resolution reads logs/, not logs/debug/,
           reference path.py:27-31 -- the fixture is already debug-sized)
  stage 2  resume the same run with ``-c`` after the LR schedule is
           extended (reference: things3d ft resumes the chairs run with
           a new schedule, ``MaskFlownet_S_ft.yaml``)
  stage 3  things3d fine-tune: new run seeded from the stage-2 checkpoint
           (``-c --clear_steps``), driving the LAZY things3d loader branch
           (path-list Dataset + bounded LRU) through the real train loop
  stage 4  cascade bootstrap: ``MaskFlownet.yaml -c <S-ckpt> --clear_steps``
           -> load_head + fix_head (cli/main.py:337-339), frozen-head
           training
  stage 5  ``--valid`` with the cascade checkpoint (sintel + kitti sweep)
  stage 6  ``--predict`` with the cascade checkpoint (sintel .flo + kitti
           16-bit PNG submission writers)

Asserts checkpoint handoff, step counters, arg-restore semantics (adopt
defaults from the resumed log; conflict-abort on an explicit model/data
mismatch), frozen-head exactness through the CLI, lazy-loader residency
bounds, and the submission artifacts.
"""

import os
import resource

import numpy as np
import pytest

from maskflownet_tpu.data import codecs


def _write_png8(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(str(path))


@pytest.fixture
def curriculum_env(tmp_path, monkeypatch):
    rng = np.random.RandomState(7)

    # --- chairs tree: 6 pairs (4 train / 2 val), native 384x512 frames
    # (the chairs .flo codec enforces the native shape) ---
    data_dir = tmp_path / "chairs"
    data_dir.mkdir()
    for i in range(1, 7):
        for j in (1, 2):
            img = rng.randint(0, 255, (384, 512, 3), dtype=np.uint8)
            with open(str(data_dir / ("%05d_img%d.ppm" % (i, j))), "wb") as fp:
                fp.write(b"P6 512 384 255\n" + img.tobytes())
        codecs.flo_save((rng.randn(384, 512, 2) * 3).astype(np.float32),
                        str(data_dir / ("%05d_flow.flo" % i)))
    chairs_split = tmp_path / "chairs_split.txt"
    chairs_split.write_text("1\n1\n1\n1\n2\n2\n")

    # --- sintel tree: training (val for chairs stages + --valid) and test
    # (for --predict); the sintel .flo codec enforces the native frame
    # shape, so frames are real-sized with tiny counts ---
    sroot = tmp_path / "sintel"
    sh, sw = 436, 1024
    for subset in ("clean", "final"):
        d = sroot / "training" / subset / "alley_1"
        d.mkdir(parents=True)
        for i in (1, 2, 3):
            _write_png8(d / f"frame_{i:04d}.png",
                        rng.randint(0, 255, (sh, sw, 3), dtype=np.uint8))
        t = sroot / "test" / subset / "temple_2"
        t.mkdir(parents=True)
        for i in (1, 2):
            _write_png8(t / f"frame_{i:04d}.png",
                        rng.randint(0, 255, (sh, sw, 3), dtype=np.uint8))
    fd = sroot / "training" / "flow" / "alley_1"
    vd = sroot / "training" / "invalid" / "alley_1"
    fd.mkdir(parents=True)
    vd.mkdir(parents=True)
    for i in (1, 2):
        codecs.flo_save((rng.randn(sh, sw, 2) * 3).astype(np.float32),
                        str(fd / f"frame_{i:04d}.flo"))
        _write_png8(vd / f"frame_{i:04d}.png",
                    (rng.randint(0, 2, (sh, sw)) * 255).astype(np.uint8))
    sintel_split = sroot / "split.txt"
    np.savetxt(str(sintel_split), np.array([1, 2, 1, 2]), fmt="%d")

    # --- things3d tree: 4 into_future pairs at the native frame size ---
    import cv2
    from maskflownet_tpu.data import things3d
    troot = tmp_path / "things3d"
    cam = troot / "train" / "image_clean" / "left"
    tfl = troot / "train" / "flow" / "left" / "into_future"
    cam.mkdir(parents=True)
    tfl.mkdir(parents=True)
    th, tw = things3d.SHAPE
    for i in range(5):
        cv2.imwrite(str(cam / ("%07d.png" % i)),
                    rng.randint(0, 255, (th, tw, 3), dtype=np.uint8))
    for i in range(4):
        codecs.flo_save((rng.randn(th, tw, 2) * 3).astype(np.float32),
                        str(tfl / ("%07d.flo" % i)))

    # --- kitti 2012 + 2015 trees, training + testing ---
    kroot = tmp_path / "kitti"
    for ed, img_dir in (("2012", "colored_0"), ("2015", "image_2")):
        idir = kroot / ed / "training" / img_dir
        fdir = kroot / ed / "training" / "flow_occ"
        tdir = kroot / ed / "testing" / img_dir
        idir.mkdir(parents=True)
        fdir.mkdir(parents=True)
        tdir.mkdir(parents=True)
        for k in range(2):
            for suff in ("10", "11"):
                _write_png8(idir / f"{k:06d}_{suff}.png",
                            rng.randint(0, 255, (120, 400, 3), dtype=np.uint8))
                _write_png8(tdir / f"{k:06d}_{suff}.png",
                            rng.randint(0, 255, (120, 400, 3), dtype=np.uint8))
            codecs.png16_save(codecs.kitti_flow_encode(
                (rng.randn(120, 400, 2) * 5).astype(np.float32)),
                str(fdir / f"{k:06d}_10.png"))

    monkeypatch.setenv("MFN_CHAIRS_DIR", str(data_dir))
    monkeypatch.setenv("MFN_CHAIRS_SPLIT", str(chairs_split))
    monkeypatch.setenv("MFN_SINTEL_ROOT", str(sroot))
    monkeypatch.setenv("MFN_SINTEL_SPLIT", str(sintel_split))
    monkeypatch.setenv("MFN_THINGS3D_ROOT", str(troot))
    monkeypatch.setenv("MFN_THINGS3D_CACHE", "4")
    monkeypatch.setenv("MFN_KITTI_ROOT", str(kroot))
    things3d._loader.cache_clear()  # adopt the env-configured LRU bound

    root = tmp_path / "exp"
    root.mkdir()
    return tmp_path, str(root)


def _run_logs(root):
    d = os.path.join(root, "logs")
    return sorted(f for f in os.listdir(d) if f.endswith(".log"))


def _params_of(npz_path, prefix=""):
    z = np.load(npz_path)
    return {k[2:]: v for k, v in z.items() if k.startswith("p:" + prefix)}


@pytest.mark.xslow
def test_cli_curriculum_end_to_end(curriculum_env):
    tmp_path, root = curriculum_env
    from maskflownet_tpu.cli.main import main

    ds_chairs = tmp_path / "ds_chairs.yaml"
    ds_chairs.write_text(
        "dataset: chairs\nvalidation_steps: 2\ncheckpoint_steps: 2\n"
        "target_shape: [64, 128]\norig_shape: [96, 160]\n")
    net_s = tmp_path / "net_s.yaml"
    net_s.write_text(
        "network:\n  class: MaskFlownet_S\n"
        "optimizer:\n  learning_rate:\n    - [4, 1.0e-4]\n")

    # ---- stage 1: chairs pretrain ----
    rc = main([str(net_s), "--dataset_cfg", str(ds_chairs), "--batch", "8", "--root", root, "--compute_dtype", "float32"])
    assert rc == 0
    (log1,) = _run_logs(root)
    run1 = log1[:-4]
    assert os.path.exists(os.path.join(root, "weights", f"{run1}_4.npz"))
    text1 = open(os.path.join(root, "logs", log1)).read()
    assert "start=0" in text1 and "steps=4" in text1
    assert "sintel." in text1  # sintel validation ran alongside chairs val

    # ---- stage 2: extend the schedule IN PLACE and resume the same run ----
    net_s.write_text(
        "network:\n  class: MaskFlownet_S\n"
        "optimizer:\n  learning_rate:\n    - [8, 1.0e-4]\n")
    # conflict-abort first: explicitly naming a DIFFERENT config while
    # resuming (no --clear_steps) must abort, not silently diverge
    net_other = tmp_path / "net_other.yaml"
    net_other.write_text("network:\n  class: MaskFlownet_S\n"
                         "optimizer:\n  learning_rate:\n    - [8, 1.0e-4]\n")
    with pytest.raises(SystemExit, match="conflict"):
        main([str(net_other), "--dataset_cfg", str(ds_chairs), "--batch", "8", "--root", root, "--compute_dtype", "float32",
              "-c", run1[:3]])
    # the real resume: compute_dtype left at its default is ADOPTED from the
    # resumed run's log (float32), steps continue 4 -> 8 in the same run id
    rc = main([str(net_s), "--dataset_cfg", str(ds_chairs), "--batch", "8", "--root", root, "-c", run1[:3]])
    assert rc == 0
    assert _run_logs(root) == [log1]  # same run id, appended
    text2 = open(os.path.join(root, "logs", log1)).read()
    assert "start=4" in text2
    assert "compute_dtype='float32'" in text2.split("start=4", 1)[1]
    s_ckpt = os.path.join(root, "weights", f"{run1}_8.npz")
    assert os.path.exists(s_ckpt)

    # ---- stage 3: things3d fine-tune, new run seeded from the S ckpt,
    # driving the lazy path-list loader through the real CLI loop ----
    from maskflownet_tpu.data import things3d
    ds_things = tmp_path / "ds_things.yaml"
    ds_things.write_text(
        "dataset: things3d\nvalidation_steps: 2\ncheckpoint_steps: 2\n"
        "target_shape: [64, 128]\norig_shape: [96, 160]\n")
    net_ft = tmp_path / "net_ft.yaml"
    net_ft.write_text(
        "network:\n  class: MaskFlownet_S\n"
        "optimizer:\n  learning_rate:\n    - [2, 5.0e-5]\n")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rc = main([str(net_ft), "--dataset_cfg", str(ds_things), "--batch", "8", "--root", root, "--compute_dtype", "float32",
               "-c", run1[:3], "--clear_steps"])
    assert rc == 0
    logs = _run_logs(root)
    assert len(logs) == 2  # --clear_steps opened a NEW run
    log3 = [f for f in logs if f != log1][0]
    run3 = log3[:-4]
    text3 = open(os.path.join(root, "logs", log3)).read()
    assert "start=0" in text3 and "steps=2" in text3
    assert "chairs" in text3  # things3d stage validates on the chairs val set
    ft_ckpt = os.path.join(root, "weights", f"{run3}_2.npz")
    assert os.path.exists(ft_ckpt)
    # lazy-loader residency: the decode LRU honors its configured bound and
    # the fixture frames were actually decoded through it
    info = things3d._loader().cache_info()
    assert info.maxsize == 4 and info.currsize <= 4, info
    assert info.misses > 0
    # the whole stage (5 native 540x960 frames listed lazily) must not have
    # grown the high-water RSS materially (eager things3d decode at
    # reference scale would be ~GBs; main.py:280-296)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert (rss1 - rss0) < 1.5e6, (rss0, rss1)  # KiB on linux: < ~1.5 GB

    # ---- stage 4: cascade bootstrap (load_head + fix_head) ----
    net_casc = tmp_path / "net_casc.yaml"
    net_casc.write_text(
        "network:\n  class: MaskFlownet\n"
        "optimizer:\n  learning_rate:\n    - [2, 1.0e-4]\n")
    rc = main([str(net_casc), "--dataset_cfg", str(ds_chairs), "--batch", "8", "--root", root, "--compute_dtype", "float32",
               "-c", run3, "--clear_steps"])
    assert rc == 0
    logs = _run_logs(root)
    assert len(logs) == 3
    log4 = [f for f in logs if f not in (log1, log3)][0]
    run4 = log4[:-4]
    casc_ckpt = os.path.join(root, "weights", f"{run4}_2.npz")
    assert os.path.exists(casc_ckpt)
    # frozen-head exactness through the CLI: after 2 cascade training steps,
    # every MaskFlownet_S/* param equals the S checkpoint bit-for-bit, and
    # the second stage actually trained (its params moved from a fresh init)
    from maskflownet_tpu.models import HEAD_SCOPE
    head_now = _params_of(casc_ckpt, HEAD_SCOPE + "/")
    s_params = _params_of(ft_ckpt)
    assert head_now and set(head_now) == {
        HEAD_SCOPE + "/" + k for k in s_params}
    for k, v in s_params.items():
        np.testing.assert_array_equal(head_now[HEAD_SCOPE + "/" + k], v)
    z = np.load(casc_ckpt)
    assert int(z["step"]) == 2
    stage2_mu = [v for k, v in z.items()
                 if k.startswith("mu:") and HEAD_SCOPE + "/" not in k]
    assert any(np.any(v != 0) for v in stage2_mu)  # stage-2 grads flowed
    head_mu = [v for k, v in z.items()
               if k.startswith("mu:" + HEAD_SCOPE + "/")]
    assert head_mu and all(np.all(v == 0) for v in head_mu)  # head frozen

    # ---- stage 5: --valid with the cascade checkpoint ----
    rc = main([str(net_casc), "--dataset_cfg", str(ds_chairs), "--valid",
               "--batch", "8", "--root", root, "--compute_dtype", "float32",
               "--resize", "64,128", "-c", run4])
    assert rc == 0
    val_logs = [f for f in os.listdir(os.path.join(root, "logs", "val"))
                if f.endswith(".val.log")]
    vtext = open(os.path.join(root, "logs", "val", val_logs[0])).read()
    assert "sintel.training" in vtext
    assert "kitti.2012:epe=" in vtext and "kitti.2015:kitti=" in vtext
    for line in vtext.splitlines():
        if ":epe=" in line:
            assert np.isfinite(float(line.rsplit("=", 1)[1]))

    # ---- stage 6: --predict with the cascade checkpoint ----
    rc = main([str(net_casc), "--dataset_cfg", str(ds_chairs), "--predict",
               "--batch", "8", "--root", root, "--compute_dtype", "float32",
               "--resize", "64,128", "-c", run4])
    assert rc == 0
    flow_root = os.path.join(root, "flows", f"{run4}_2")
    flos = []
    for dirpath, _, files in os.walk(flow_root):
        flos += [os.path.join(dirpath, f) for f in files if f.endswith(".flo")]
    assert flos  # sintel test 'final' submission written
    fl = codecs.flo_load(flos[0])
    assert fl.shape == (436, 1024, 2) and np.isfinite(fl).all()
    kpngs = []
    for ed in ("2012", "2015"):
        d = os.path.join(flow_root, "kitti_" + ed)
        kpngs += [os.path.join(d, f) for f in os.listdir(d)] if os.path.isdir(d) else []
    assert kpngs  # kitti 16-bit PNG submission written
