"""ORB extractor + Hamming matching property tests.

No OpenCV in this environment, so instead of golden outputs we verify the
detector/descriptor *properties* the pipeline relies on: corners found where
corners are, shift equivariance, descriptor stability, rotation-steered
matching, and the +/-1-matmul Hamming identity against packed popcount.
"""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.ops import matching, orb

PAR = orb.OrbParams(n_features=300, height=240, width=320, ini_th=20.0, min_th=7.0)


def squares_img(h=240, w=320, sq=30, gap=20, lo=50.0, hi=200.0):
    """Bright squares on dark background: each square corner has a ~270 deg
    dark arc -> ideal FAST-9 corners (unlike a perfect checkerboard, whose
    crossings have exactly-8-contiguous arcs and are FAST-degenerate)."""
    img = np.full((h, w), lo, np.float32)
    step = sq + gap
    for y0 in range(gap, h - sq, step):
        for x0 in range(gap, w - sq, step):
            img[y0:y0 + sq, x0:x0 + sq] = hi
    return jnp.asarray(img)


def textured_img(key, h=240, w=320):
    """Smooth random blobs -> strong corners after thresholding."""
    rng = np.random.default_rng(key)
    base = rng.standard_normal((h // 8, w // 8))
    img = np.asarray(
        jax.image.resize(jnp.asarray(base), (h, w), method="bilinear")
    )
    img = (img > 0).astype(np.float32) * 150.0 + 50.0
    return jnp.asarray(img)


class TestFast:
    def test_square_corners(self):
        img = squares_img()
        score = orb.fast_score(img, 20.0)
        score = orb.nms3(score)
        ys, xs = np.nonzero(np.asarray(score) > 0)
        assert len(ys) > 10
        # every detection must be near a square corner: corners lie at
        # gap + k*(sq+gap) and gap + sq - 1 + k*(sq+gap)
        step = 50
        def near_corner(c):
            r = c % step
            return np.minimum.reduce([np.abs(r - 20), np.abs(r - 49), np.abs(r - 20 + step), np.abs(r - 49 + step)])
        d = near_corner(ys) + near_corner(xs)
        assert d.max() <= 6

    def test_flat_image_no_corners(self):
        img = jnp.full((240, 320), 128.0)
        assert float(jnp.sum(orb.fast_score(img, 7.0))) == 0.0

    def test_detect_level_budget(self):
        img = textured_img(0)
        ys, xs, resp, valid = orb.detect_level(img, PAR, 200)
        assert ys.shape == (200,)
        assert int(valid.sum()) > 50
        # valid slots come first (top_k ordering), and scores are descending
        r = np.asarray(resp)
        assert (np.diff(r) <= 1e-6).all()


class TestExtract:
    def test_shapes_and_levels(self):
        img = textured_img(1)
        f = orb.extract(img, PAR)
        n = sum(PAR.level_budgets())
        assert f.xy.shape == (n, 2)
        assert f.desc.shape == (n, 32)
        assert f.desc_pm1.shape == (n, 256)
        assert int(f.valid.sum()) > 100
        # multiple pyramid levels contribute
        assert len(np.unique(np.asarray(f.octave)[np.asarray(f.valid)])) >= 3

    def test_jit_and_shift_equivariance(self):
        img = np.asarray(textured_img(2))
        shift = 8
        img2 = np.roll(img, (0, shift), (0, 1))
        ex = jax.jit(lambda im: orb.extract(im, PAR))
        f1 = ex(jnp.asarray(img))
        f2 = ex(jnp.asarray(img2))
        # match level-0 features; recovered displacement == shift
        res = matching.search_for_initialization(f1, f2, window=60.0)
        v = np.asarray(res.valid)
        assert v.sum() > 30
        dx = np.asarray(f2.xy)[np.asarray(res.idx)[v], 0] - np.asarray(f1.xy)[v, 0]
        dy = np.asarray(f2.xy)[np.asarray(res.idx)[v], 1] - np.asarray(f1.xy)[v, 1]
        assert abs(np.median(dx) - shift) < 1.0
        assert abs(np.median(dy)) < 1.0

    def test_descriptor_stability_under_noise(self):
        img = np.asarray(textured_img(3))
        rng = np.random.default_rng(0)
        img_n = img + 3.0 * rng.standard_normal(img.shape).astype(np.float32)
        f1 = orb.extract(jnp.asarray(img), PAR)
        f2 = orb.extract(jnp.asarray(img_n), PAR)
        res = matching.search_for_initialization(f1, f2, window=6.0)
        v = np.asarray(res.valid)
        assert v.sum() > 20
        # matched descriptors should be close (far below random ~128)
        assert float(np.median(np.asarray(res.dist)[v])) < 30


class TestHamming:
    def test_matmul_matches_popcount(self):
        rng = np.random.default_rng(0)
        bits_a = rng.integers(0, 2, (40, 256)).astype(bool)
        bits_b = rng.integers(0, 2, (50, 256)).astype(bool)
        pm1_a = jnp.asarray(np.where(bits_a, 1, -1), jnp.int8)
        pm1_b = jnp.asarray(np.where(bits_b, 1, -1), jnp.int8)
        d = np.asarray(matching.hamming_matrix(pm1_a, pm1_b))
        ref = (bits_a[:, None, :] ^ bits_b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, ref)

    def test_best_match_ratio(self):
        # row 0: two близких candidates -> ratio test kills it
        dist = jnp.asarray([[10.0, 11.0, 200.0], [5.0, 100.0, 200.0]])
        allowed = jnp.ones((2, 3), bool)
        res = matching.best_match(dist, allowed, max_dist=50, ratio=0.8)
        assert not bool(res.valid[0])
        assert bool(res.valid[1]) and int(res.idx[1]) == 0

    def test_mutual_filter(self):
        res = matching.MatchResult(
            idx=jnp.asarray([2, 2, 1]), dist=jnp.asarray([5.0, 3.0, 7.0]),
            valid=jnp.asarray([True, True, True]),
        )
        out = matching.mutual_filter(res, 4)
        assert not bool(out.valid[0])  # row 1 is closer to column 2
        assert bool(out.valid[1]) and bool(out.valid[2])


class TestEpipolar:
    def test_epipolar_mask(self):
        # F for a pure horizontal translation: lines are horizontal ->
        # correspondence must share the y coordinate.
        F = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
        uv1 = jnp.asarray([[100.0, 50.0]])
        uv2 = jnp.asarray([[140.0, 50.0], [140.0, 80.0]])
        m = matching.epipolar_mask(F, uv1, uv2, jnp.ones(2))
        assert bool(m[0, 0]) and not bool(m[0, 1])
