"""Headless visualization (viz.py — FrameDrawer/MapDrawer/Viewer analogs
of src/FrameDrawer.cc, src/MapDrawer.cc, src/Viewer.cc)."""

import os

import numpy as np

from viorb_tpu import viz


def test_frame_drawer_overlay():
    img = np.full((48, 64), 100.0, np.float32)
    xy = np.array([[10.0, 10.0], [30.0, 20.0], [200.0, 200.0]])
    valid = np.array([True, True, False])
    matched = np.array([True, False, False])
    fd = viz.FrameDrawer()
    rgb, status = fd.draw(img, xy, valid, matched)
    assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8
    # green square around the matched keypoint, blue dot on the other
    assert (rgb[10 - 3, 10 - 3:10 + 4] == viz.GREEN).all()
    assert (rgb[20, 30] == viz.BLUE).all()
    assert fd.n_tracked == 1
    assert "matches: 1" in status


def test_frustum_segments_shape_and_apex():
    Rcw = np.eye(3)[None]
    tcw = np.array([[0.0, 0.0, -2.0]])  # camera center at (0,0,2)
    segs = viz.frustum_segments(Rcw, tcw, size=0.1)
    assert segs.shape == (1, 8, 2, 3)
    # first 4 segments start at the camera center
    np.testing.assert_allclose(segs[0, :4, 0], np.tile([0, 0, 2.0], (4, 1)))
    # corners sit in front of the camera (+z in world here)
    assert (segs[0, :4, 1, 2] > 2.0).all()


def test_map_drawer_saves_png(tmp_path):
    rng = np.random.default_rng(0)
    L, K, N = 50, 3, 8
    lm_pos = rng.normal(0, 1, (L, 3))
    lm_valid = np.ones(L, bool)
    Rcw = np.tile(np.eye(3), (K, 1, 1))
    tcw = np.stack([[0, 0, i * 0.2] for i in range(K)]).astype(float)
    assoc = np.full((K, N), -1, np.int64)
    assoc[:, :N] = np.arange(N)  # all KFs share N landmarks -> covis edges
    p = str(tmp_path / "map.png")
    viz.MapDrawer(min_covis_weight=2).save(
        p, lm_pos, lm_valid, Rcw, tcw, K, assoc=assoc,
        current=(np.eye(3), np.zeros(3)),
    )
    assert os.path.getsize(p) > 1000


def test_viewer_update_cadence(tmp_path):
    class FakeSystem:
        state = "OK"

        class map:  # noqa: N801 - mimics MapArrays attribute access
            class lms:
                pos = np.zeros((4, 3))
                valid = np.ones(4, bool)

            class kfs:
                Rcw = np.tile(np.eye(3), (2, 1, 1))
                tcw = np.zeros((2, 3))

            assoc = np.full((2, 4), -1)
            n_kfs = 2

    v = viz.Viewer(out_dir=str(tmp_path / "viz"), every=2)
    img = np.zeros((24, 32), np.float32)
    xy = np.zeros((3, 2))
    valid = np.ones(3, bool)
    assert v.update(FakeSystem, img, xy, valid) is None  # frame 1: skipped
    out = v.update(FakeSystem, img, xy, valid)  # frame 2: rendered
    assert out is not None
    assert os.path.exists(out["frame_png"]) and os.path.exists(out["map_png"])
