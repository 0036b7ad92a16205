"""Native C++ image loader: PNG/PGM decode parity with PIL and ordered
multithreaded prefetch (native/src/loader.cpp — the runtime IO component
mirroring the reference's image callback queue, `ros_vio.cc:122-162`)."""

import os

import numpy as np
import pytest

from viorb_tpu import native
from viorb_tpu.io import euroc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture
def png_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    paths, arrays = [], []
    for i in range(10):
        a = rng.integers(0, 256, (32, 40), np.uint8)
        p = str(tmp_path / f"img_{i:03d}.png")
        Image.fromarray(a, "L").save(p)
        paths.append(p)
        arrays.append(a.astype(np.float32))
    return paths, arrays


def test_decode_png_matches_pil(png_dir):
    paths, arrays = png_dir
    for p, a in zip(paths, arrays):
        im = native.decode_image(p)
        assert im is not None and im.shape == a.shape
        np.testing.assert_array_equal(im, a)


def test_decode_rgb_png_converts_to_gray(tmp_path):
    from PIL import Image

    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0] = 200  # pure red
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, "RGB").save(p)
    im = native.decode_image(p)
    assert im is not None and im.shape == (8, 8)
    # BT.709: 0.2126 * 200 ~= 42.5; just require a sane gray level
    assert 30 < float(im.mean()) < 60


def test_decode_pgm(tmp_path):
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "img.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n8 8\n255\n" + a.tobytes())
    im = native.decode_image(p)
    assert im is not None
    np.testing.assert_array_equal(im, a.astype(np.float32))

    assert native.decode_image(str(tmp_path / "missing.png")) is None


def test_prefetch_ordered(png_dir):
    paths, arrays = png_dir
    got = list(native.ImageLoader(paths, n_threads=3, capacity=4))
    assert len(got) == len(arrays)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a)


def test_prefetch_decode_failure_yields_none(png_dir, tmp_path):
    paths, arrays = png_dir
    bad = str(tmp_path / "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"not a png at all")
    seq = [paths[0], bad, paths[1]]
    got = list(native.ImageLoader(seq, n_threads=2, capacity=2))
    assert len(got) == 3
    np.testing.assert_array_equal(got[0], arrays[0])
    assert got[1] is None
    np.testing.assert_array_equal(got[2], arrays[1])


def test_euroc_load_image_and_prefetch_paths(png_dir):
    paths, arrays = png_dir
    np.testing.assert_array_equal(euroc.load_image(paths[0]), arrays[0])
    got = list(euroc.prefetch_images(paths, n_threads=2, capacity=3))
    assert len(got) == len(arrays)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a)
