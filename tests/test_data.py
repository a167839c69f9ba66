"""Data-layer tests: codecs round-trip on synthetic files, reader behavior on
synthetic dataset trees, loader crop/flip/mixing semantics."""

import os
import struct
import zlib

import numpy as np
import pytest

from maskflownet_tpu.data import (Dataset, TrainLoader, chairs, codecs, hd1k,
                                  kitti, sintel)
from maskflownet_tpu.data.resize import resize_bilinear_np

rng = np.random.RandomState(0)


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def test_flo_roundtrip(tmp_path):
    arr = rng.randn(7, 9, 2).astype(np.float32)
    p = str(tmp_path / "a.flo")
    codecs.flo_save(arr, p)
    back = codecs.flo_load(p)
    np.testing.assert_array_equal(arr, back)
    # (dy, dx) conversion flips the channel order
    dydx = codecs.read_flo_dydx(p)
    np.testing.assert_array_equal(dydx[..., 0], arr[..., 1])
    np.testing.assert_array_equal(dydx[..., 1], arr[..., 0])


def test_flo_bad_magic(tmp_path):
    p = str(tmp_path / "bad.flo")
    with open(p, "wb") as fp:
        fp.write(struct.pack("<fii", 1.0, 4, 4) + b"\x00" * 128)
    with pytest.raises(ValueError):
        codecs.flo_load(p)


def test_ppm_load(tmp_path):
    arr = rng.randint(0, 255, (384, 512, 3), dtype=np.uint8)
    p = str(tmp_path / "a.ppm")
    with open(p, "wb") as fp:
        fp.write(b"P6 512 384 255\n" + arr.tobytes())
    np.testing.assert_array_equal(codecs.ppm_load(p), arr)


def test_png16_roundtrip(tmp_path):
    arr = rng.randint(0, 65536, (37, 53, 3)).astype(np.uint16)
    p = str(tmp_path / "a.png")
    codecs.png16_save(arr, p)
    np.testing.assert_array_equal(codecs.png16_load(p), arr)


@pytest.mark.parametrize("filters", [(1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_png16_all_filters(tmp_path, filters):
    """Decode PNGs written with each scanline filter type (exercises the
    native unfilter kernel and its fallback)."""
    h, w, c = 11, 13, 3
    arr = rng.randint(0, 65536, (h, w, c)).astype(np.uint16)
    bpp = c * 2
    # encode manually with the requested filters
    rows = []
    prev = np.zeros(w * bpp, np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        raw = np.frombuffer(arr[y].astype(">u2").tobytes(), np.uint8).astype(np.int32)
        if ft == 0:
            enc = raw
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), raw[:-bpp]])
            enc = raw - left
        elif ft == 2:
            enc = raw - prev
        elif ft == 3:
            enc = np.empty_like(raw)
            for i in range(len(raw)):
                left = raw[i - bpp] if i >= bpp else 0
                enc[i] = raw[i] - ((left + prev[i]) >> 1)
        else:
            enc = np.empty_like(raw)
            for i in range(len(raw)):
                a = raw[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = raw[i] - pred
        rows.append(bytes([ft]) + (enc % 256).astype(np.uint8).tobytes())
        prev = raw

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    p = str(tmp_path / "f.png")
    with open(p, "wb") as fp:
        fp.write(b"\x89PNG\r\n\x1a\n")
        fp.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)))
        fp.write(chunk(b"IDAT", zlib.compress(b"".join(rows))))
        fp.write(chunk(b"IEND", b""))
    np.testing.assert_array_equal(codecs.png16_load(p), arr)


def test_png16_py_fallback_matches_native():
    from maskflownet_tpu.data.codecs import _unfilter_py
    from maskflownet_tpu import native
    lib = native.load()
    if lib is None:
        pytest.skip("no native lib")
    h, stride, bpp = 9, 24, 6
    raw = rng.randint(0, 256, (h, stride)).astype(np.uint8)
    filters = rng.randint(0, 5, h).astype(np.uint8)
    want = _unfilter_py(raw.copy(), filters, bpp)
    got = np.ascontiguousarray(raw.copy())
    assert lib.png_unfilter(got.ctypes.data, h, stride, bpp,
                            np.ascontiguousarray(filters).ctypes.data) == 0
    np.testing.assert_array_equal(got, want)


def test_kitti_flow_codec_roundtrip():
    flow = (rng.randn(8, 10, 2) * 20).astype(np.float32)
    enc = codecs.kitti_flow_encode(flow)
    dec, occ = codecs.kitti_flow_decode(enc)
    np.testing.assert_allclose(dec, flow, atol=1 / 64.0)
    assert (occ == 1).all()


# ---------------------------------------------------------------------------
# readers over synthetic trees
# ---------------------------------------------------------------------------

def _write_png8(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


@pytest.fixture
def sintel_tree(tmp_path):
    root = tmp_path / "sintel"
    n_pairs = 0
    for part in ("training",):
        for subset in ("clean", "final"):
            for seq in ("alley_1", "ambush_2"):
                d = root / part / subset / seq
                d.mkdir(parents=True)
                for i in range(1, 4):
                    _write_png8(str(d / f"frame_{i:04d}.png"),
                                rng.randint(0, 255, (32, 48, 3), dtype=np.uint8))
            for seq in ("alley_1", "ambush_2"):
                fd = root / part / "flow" / seq
                vd = root / part / "invalid" / seq
                fd.mkdir(parents=True, exist_ok=True)
                vd.mkdir(parents=True, exist_ok=True)
                for i in range(1, 3):
                    codecs.flo_save(rng.randn(32, 48, 2).astype(np.float32),
                                    str(fd / f"frame_{i:04d}.flo"))
                    _write_png8(str(vd / f"frame_{i:04d}.png"),
                                rng.randint(0, 2, (32, 48), dtype=np.uint8) * 255)
                    if subset == "clean":
                        n_pairs += 1
    (root / "test" / "clean").mkdir(parents=True)
    (root / "test" / "final").mkdir(parents=True)
    split = root / "split.txt"
    # whole-sequence labels (alley_1 -> train1, ambush_2 -> train2), matching
    # the official split file's structure; mixed per-sequence labels are a
    # split/enumeration-order mismatch that list_data rejects
    np.savetxt(str(split), np.array([1, 1, 2, 2] * 2), fmt="%d")
    return str(root), str(split)


def test_sintel_reader(sintel_tree):
    root, split = sintel_tree
    ds = sintel.list_data(root, split)
    assert len(ds["training"]["clean"]) == 4  # 2 seqs x 2 pairs
    assert len(ds["training1"]["clean"]) + len(ds["training2"]["clean"]) == 4
    assert len(ds["training1"]["clean"]) == 2  # alley_1 whole-sequence
    assert all("alley_1" in e[0] for e in ds["training1"]["clean"])
    assert all("ambush_2" in e[0] for e in ds["training2"]["clean"])
    img1, img2, flow, inv = ds["training"]["clean"][0]
    a = sintel.load.__wrapped__(img1)
    assert a.shape == (32, 48, 3) and a.dtype == np.uint8
    f = codecs.read_flo_dydx(flow)
    assert f.shape == (32, 48, 2)
    m = sintel.load.__wrapped__(inv)
    assert m.shape == (32, 48, 1) and set(np.unique(m)) <= {0, 255}


def test_sintel_split_order_guard(sintel_tree, tmp_path):
    """An OFFICIAL-scale split file whose labels mix within a sequence
    (enumeration-order mismatch) must raise, not silently contaminate train
    with val frames; small custom files only warn (the reference semantics
    are line-per-pair, so intentional per-pair splits are legal)."""
    root, _ = sintel_tree
    official_scale = tmp_path / "official_scale.txt"
    np.savetxt(str(official_scale),
               np.tile([1, 2], 521)[:1041], fmt="%d")
    with pytest.raises(ValueError, match="mixed"):
        sintel.list_data(root, str(official_scale))
    custom = tmp_path / "custom_split.txt"
    np.savetxt(str(custom), np.array([1, 2, 1, 2] * 2), fmt="%d")
    with pytest.warns(UserWarning, match="mixed"):
        sintel.list_data(root, str(custom))
    short = tmp_path / "short_split.txt"
    np.savetxt(str(short), np.array([1, 1]), fmt="%d")
    with pytest.raises(ValueError, match="split"):
        sintel.list_data(root, str(short))


@pytest.fixture
def kitti_tree(tmp_path):
    root = tmp_path / "kitti"
    n = 6
    for ed, imgdir in (("2012", "colored_0"), ("2015", "image_2")):
        idir = root / ed / "training" / imgdir
        fdir = root / ed / "training" / "flow_occ"
        idir.mkdir(parents=True)
        fdir.mkdir(parents=True)
        for k in range(n + 1):
            for suff in ("10", "11"):
                _write_png8(str(idir / f"{k:06d}_{suff}.png"),
                            rng.randint(0, 255, (40, 60, 3), dtype=np.uint8))
            flow = (rng.randn(40, 60, 2) * 10).astype(np.float32)
            codecs.png16_save(codecs.kitti_flow_encode(flow),
                              str(fdir / f"{k:06d}_10.png"))
    return str(root)


def test_kitti_reader(kitti_tree):
    ds = kitti.read_dataset(kitti.default_paths(kitti_tree), editions="2012",
                            parts="mixed", samples=6)
    assert len(ds["flow"]) == 6
    assert ds["image_0"][0].shape == (40, 60, 3)
    assert ds["flow"][0].shape == (40, 60, 2)
    assert ds["occ"][0].dtype == np.uint8 and set(np.unique(ds["occ"][0])) <= {0, 255}
    # train/valid split: index 0 is a validation index for 2012
    tr = kitti.read_dataset(kitti.default_paths(kitti_tree), editions="2012",
                            parts="train", samples=6)
    va = kitti.read_dataset(kitti.default_paths(kitti_tree), editions="2012",
                            parts="valid", samples=6)
    assert len(tr["flow"]) + len(va["flow"]) == 6
    assert len(va["flow"]) == 1  # only index 0 < 6 in VALIDATE_INDICES['2012']


def test_kitti_reader_resize(kitti_tree):
    ds = kitti.read_dataset(kitti.default_paths(kitti_tree), editions="2012",
                            samples=2, resize=(30, 20))  # (w, h)
    assert ds["image_0"][0].shape == (20, 30, 3)
    assert ds["flow"][0].shape == (20, 30, 2)


def test_chairs_reader(tmp_path):
    data_dir = tmp_path / "chairs"
    data_dir.mkdir()
    img = rng.randint(0, 255, (384, 512, 3), dtype=np.uint8)
    flow = rng.randn(384, 512, 2).astype(np.float32)
    for i in (1, 2):
        for j in (1, 2):
            with open(str(data_dir / ("%05d_img%d.ppm" % (i, j))), "wb") as fp:
                fp.write(b"P6 512 384 255\n" + img.tobytes())
        codecs.flo_save(flow, str(data_dir / ("%05d_flow.flo" % i)))
    split = tmp_path / "split.txt"
    with open(str(split), "w") as fp:
        fp.write("1\n2\n" + "1\n" * 22870)
    train, val = chairs.read_trainval(str(split))
    assert train[0] == 1 and val[0] == 2
    i1, i2, fl = chairs.load_sample(1, str(data_dir))
    np.testing.assert_array_equal(i1, img)
    np.testing.assert_array_equal(fl[..., 0], flow[..., 1])


def test_chairs_binary_reader(tmp_path):
    h, w = 8, 10
    img1 = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    img2 = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    flow = rng.randn(h, w, 2).astype(np.float32)
    bad_flow = flow.copy()
    bad_flow[0, 0, 0] = np.nan
    with open(str(tmp_path / "train0_2.bin"), "wb") as fp:
        fp.write(img1.tobytes() + img2.tobytes() + flow.tobytes())
        fp.write(img1.tobytes() + img2.tobytes() + bad_flow.tobytes())
    a, b, c = chairs.load_binary(str(tmp_path), "train", shape=(h, w))
    assert len(a) == 1  # NaN record dropped
    np.testing.assert_array_equal(a[0], img1)
    np.testing.assert_array_equal(c[0][..., 0], flow[..., 1])


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def test_loader_crop_flip_and_mixing():
    n = 8
    oh, ow = 16, 20
    img = [np.full((24, 30, 3), i, np.uint8) for i in range(n)]
    flow = [np.full((24, 30, 2), 1.0, np.float32) for _ in range(n)]
    ds_a = Dataset((img, img, flow))
    img_b = [np.full((24, 30, 3), 100 + i, np.uint8) for i in range(n)]
    ds_b = Dataset((img_b, img_b, flow))
    loader = TrainLoader([ds_a, ds_b], batch_size=4, orig_shape=(oh, ow),
                         seed=1)
    batch = loader.get()
    assert len(batch) == 3
    assert batch[0].shape == (4, oh, ow, 3)
    assert batch[2].shape == (4, oh, ow, 2)
    # fixed mixing: first 2 from ds_a (< 100), next 2 from ds_b
    assert (batch[0][:2] < 100).all() and (batch[0][2:] >= 100).all()
    # flip negates dx only: |dx| stays 1
    np.testing.assert_allclose(np.abs(batch[2][..., 1]), 1.0)
    np.testing.assert_allclose(batch[2][..., 0], 1.0)


def test_loader_sharding_partitions_epoch():
    """Two shards see disjoint samples within an epoch (same seed)."""
    n = 8
    img = [np.full((4, 4, 3), i, np.uint8) for i in range(n)]
    flow = [np.zeros((4, 4, 2), np.float32) for _ in range(n)]
    ds0 = Dataset((img, img, flow))
    from queue import Queue
    import threading
    seen = [set(), set()]
    for shard in (0, 1):
        q = Queue(maxsize=n)
        t = threading.Thread(
            target=__import__("maskflownet_tpu.data.loader", fromlist=["iterate_data"]).iterate_data,
            args=(q, ds0, (4, 4), 7, shard, 2), daemon=True)
        t.start()
        for _ in range(n // 2):
            seen[shard].add(int(q.get()[0][0, 0, 0]))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == n


def test_resize_bilinear_np_matches_device_op():
    import jax.numpy as jnp
    from maskflownet_tpu.ops import resize_bilinear
    x = rng.rand(9, 13, 2).astype(np.float32)
    a = resize_bilinear_np(x, 17, 23)
    b = np.asarray(resize_bilinear(jnp.asarray(x[None]), 17, 23))[0]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_device_batch_cache_serves_and_refreshes():
    """DeviceBatchCache: first get() blocks until a slot is resident; slots
    refresh in the background; no immediate slot repeats while refreshing
    lags; echo accounting is consistent."""
    import time

    from maskflownet_tpu.data import DeviceBatchCache
    from maskflownet_tpu.parallel import make_mesh

    mesh = make_mesh()
    n_src = 5
    calls = {"n": 0}

    def source():
        i = calls["n"]
        calls["n"] += 1
        if i >= n_src:
            return None
        time.sleep(0.01)
        return (np.full((8, 4, 4, 3), i, np.uint8),
                np.zeros((8, 4, 4, 2), np.float16))

    cache = DeviceBatchCache(source, mesh, slots=3, seed=1)
    got = [cache.get() for _ in range(10)]
    for b in got:
        assert len(b) == 2 and b[0].shape == (8, 4, 4, 3)
    # wait for the refresh thread to drain the source
    for _ in range(100):
        if cache.transfers == n_src:
            break
        time.sleep(0.05)
    assert cache.transfers == n_src
    assert cache.serves == 10
    assert cache.echo_factor == 10 / n_src
    # values must come from the source (device round-trip intact)
    vals = {int(np.asarray(b[0])[0, 0, 0, 0]) for b in got}
    assert vals <= set(range(n_src))
    cache.stop()


def test_things3d_lazy_listing_and_loader(tmp_path, monkeypatch):
    """Things3D is path-listed and decoded lazily through a bounded LRU
    (VERDICT r3 #8): the Dataset holds file paths, loader threads decode on
    demand, and the cache stays within its configured entry bound -- the
    reference instead decodes the whole ~400 GB shard into RAM up front
    (main.py:280-296)."""
    import cv2

    from maskflownet_tpu.data import things3d

    root = tmp_path / "things3d"
    cam = root / "train" / "image_clean" / "left"
    flo = root / "train" / "flow" / "left" / "into_future"
    cam.mkdir(parents=True)
    flo.mkdir(parents=True)
    h, w = things3d.SHAPE
    rng = np.random.RandomState(0)
    n = 5
    for i in range(n + 1):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(cam / ("%07d.png" % i)), img)
    for i in range(n):
        arr = (rng.randn(h, w, 2) * 3).astype(np.float32)
        codecs.flo_save(arr, str(flo / ("%07d.flo" % i)))

    monkeypatch.setenv("MFN_THINGS3D_ROOT", str(root))
    monkeypatch.setenv("MFN_THINGS3D_CACHE", "4")
    things3d._loader.cache_clear()  # re-read the env-configured bound

    listing = things3d.list_data()
    assert len(listing["flow"]) == n
    # into_future pairing: image_1 is frame index + 1
    assert listing["image_0"][0].endswith("0000000.png")
    assert listing["image_1"][0].endswith("0000001.png")
    # entries are PATHS (lazy), not arrays
    assert all(isinstance(p, str) for p in listing["image_0"])

    # flow decodes to f16 (cache-compact, reference main.py:297 parity)
    fl = things3d.load(listing["flow"][0])
    assert fl.dtype == np.float16 and fl.shape == (h, w, 2)
    im = things3d.load(listing["image_0"][0])
    assert im.dtype == np.uint8 and im.shape == (h, w, 3)

    # the LRU stays bounded at the configured entry count
    for p in listing["flow"] + listing["image_0"][:n]:
        things3d.load(p)
    info = things3d._loader().cache_info()
    assert info.maxsize == 4 and info.currsize <= 4, info

    # end-to-end: TrainLoader over the lazy Dataset yields crop+flip batches
    ds = Dataset((listing["image_0"], listing["image_1"], listing["flow"]),
                 load=things3d.load)
    loader = TrainLoader([ds], batch_size=2, orig_shape=(384, 768), seed=3)
    b = loader.get()
    assert b[0].shape == (2, 384, 768, 3)
    assert b[2].shape == (2, 384, 768, 2)
    assert np.isfinite(b[2].astype(np.float32)).all()
