"""Dataset readers: TUM (mono/RGB-D association), KITTI (mono/stereo),
EuRoC stereo pairing — the loaders behind the reference's driver
executables (Examples/Monocular/mono_{tum,kitti}.cc,
Examples/Stereo/stereo_{kitti,euroc}.cc, Examples/RGB-D/rgbd_tum.cc)."""

import os

import numpy as np
import pytest

from viorb_tpu.io import euroc, kitti, tum


@pytest.fixture
def tum_root(tmp_path):
    root = tmp_path / "fr1"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    with open(root / "rgb.txt", "w") as f:
        f.write("# color images\n# file: x\n")
        for i in range(5):
            f.write(f"{100.0 + i * 0.033:.6f} rgb/{i}.png\n")
    with open(root / "depth.txt", "w") as f:
        f.write("# depth images\n")
        # depth stamps slightly offset from rgb
        for i in range(5):
            f.write(f"{100.012 + i * 0.033:.6f} depth/{i}.png\n")
    return str(root)


def test_tum_mono_stream(tum_root):
    items = list(tum.mono_stream(tum_root))
    assert len(items) == 5
    path, t = items[0]
    assert path.endswith("rgb/0.png") and t == pytest.approx(100.0)
    ts = [t for _, t in items]
    assert ts == sorted(ts)


def test_tum_associate_pairs_nearest(tum_root):
    pairs = tum.associate(tum_root, max_dt=0.02)
    assert len(pairs) == 5
    for i, (t, rgb, dep) in enumerate(pairs):
        assert rgb == f"rgb/{i}.png" and dep == f"depth/{i}.png"
    # tight threshold rejects the 12 ms offset
    assert tum.associate(tum_root, max_dt=0.005) == []


def test_tum_rgbd_stream_with_associations(tum_root, tmp_path):
    assoc = tmp_path / "assoc.txt"
    with open(assoc, "w") as f:
        f.write("100.0 rgb/0.png 100.012 depth/0.png\n")
        f.write("100.033 rgb/1.png 100.045 depth/1.png\n")
    items = list(tum.rgbd_stream(tum_root, str(assoc)))
    assert len(items) == 2
    rgb_p, dep_p, t = items[0]
    assert rgb_p.endswith("rgb/0.png") and dep_p.endswith("depth/0.png")
    assert t == pytest.approx(100.0)


def test_tum_load_depth(tmp_path):
    from PIL import Image

    arr = (np.arange(12, dtype=np.uint16) * 1000).reshape(3, 4)
    p = str(tmp_path / "d.png")
    Image.fromarray(arr).save(p)
    d = tum.load_depth(p)
    assert d.dtype == np.float32
    np.testing.assert_allclose(d, arr / 5000.0)


@pytest.fixture
def kitti_root(tmp_path):
    root = tmp_path / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    with open(root / "times.txt", "w") as f:
        for i in range(4):
            f.write(f"{i * 0.1:.6e}\n")
    return str(root)


def test_kitti_streams(kitti_root):
    mono = list(kitti.mono_stream(kitti_root))
    assert len(mono) == 4
    assert mono[2][0].endswith(os.path.join("image_0", "000002.png"))
    assert mono[2][1] == pytest.approx(0.2)
    st = list(kitti.stereo_stream(kitti_root))
    assert st[3][0].endswith(os.path.join("image_0", "000003.png"))
    assert st[3][1].endswith(os.path.join("image_1", "000003.png"))


@pytest.fixture
def euroc_root(tmp_path):
    root = tmp_path / "MH"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
        with open(root / "mav0" / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(4):
                # cam1 drops frame 2
                if cam == "cam1" and i == 2:
                    continue
                f.write(f"{int(1e9 * (5 + i * 0.05))},{i}.png\n")
    return str(root)


def test_euroc_stereo_pairing(euroc_root):
    pairs = list(euroc.stereo_stream(euroc_root))
    # frame 2 has no right partner within 5 ms -> skipped
    assert len(pairs) == 3
    for lp, rp, t in pairs:
        assert os.path.basename(lp) == os.path.basename(rp)
    assert pairs[0][2] == pytest.approx(5.0)
