"""Stereo matching op + stereo/RGB-D SLAM end-to-end tests.

Covers Frame::ComputeStereoMatches / ComputeStereoFromRGBD and the
TrackStereo / TrackRGBD system paths of the reference.
"""

import numpy as np
import jax
import jax.numpy as jnp

from viorb_tpu.io import evaluate, synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.ops import stereo as stereo_ops
from viorb_tpu.ops.orb import OrbFeatures
from viorb_tpu.pipeline.stereo_system import RgbdSystem, StereoSystem, unproject
from viorb_tpu.pipeline.system import OK
from viorb_tpu.pipeline.tracking import FrameData
from viorb_tpu.solver.ba import Camera

from test_mono_e2e import FeatureSim, N_FEAT, W, H

BASELINE = 0.11
CAM_S = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0, bf=458.0 * BASELINE)


def _analytic_image(H_, W_, shift=0.0):
    """Smooth band-limited texture; shift moves content left by `shift` px
    (img_shifted(x) = img(x + shift))."""
    y, x = np.mgrid[0:H_, 0:W_].astype(np.float64)
    x = x + shift
    img = (
        np.sin(0.35 * x) * np.cos(0.27 * y)
        + 0.7 * np.sin(0.12 * x + 0.3 * y)
        + 0.5 * np.cos(0.08 * x - 0.2 * y)
        + 0.3 * np.sin(0.53 * x + 0.11 * y)
    )
    return img.astype(np.float32)


def _grid_features(rng, n, W_, H_, margin=40):
    xs = rng.uniform(margin, W_ - margin, n)
    ys = rng.uniform(margin, H_ - margin, n)
    bits = rng.integers(0, 2, (n, 256)).astype(bool)
    pm1 = np.where(bits, 1, -1).astype(np.int8)

    def feats(xy, pm1):
        n = len(xy)
        return OrbFeatures(
            xy=jnp.asarray(xy, jnp.float32),
            response=jnp.full(n, 10.0),
            octave=jnp.zeros(n, jnp.int32),
            angle=jnp.zeros(n, jnp.float32),
            sigma2=jnp.ones(n, jnp.float32),
            desc=jnp.zeros((n, 32), jnp.uint8),
            desc_pm1=jnp.asarray(pm1),
            valid=jnp.ones(n, bool),
        )

    return xs, ys, pm1, feats


def test_match_stereo_subpixel():
    """A constant-disparity shifted image pair: every feature must match at
    u - d with sub-pixel accuracy and depth bf/d."""
    rng = np.random.default_rng(0)
    Ht, Wt = 240, 320
    d_true = 7.3
    img_l = _analytic_image(Ht, Wt)
    img_r = _analytic_image(Ht, Wt, shift=d_true)

    n = 64
    xs, ys, pm1, mk = _grid_features(rng, n, Wt, Ht)
    feats_l = mk(np.stack([xs, ys], -1), pm1)
    feats_r = mk(np.stack([xs - d_true, ys], -1), pm1)

    bf = 30.0
    sd = stereo_ops.match_stereo(
        feats_l, feats_r, jnp.asarray(img_l), jnp.asarray(img_r),
        bf=bf, min_z=bf / 40.0,
    )
    ok = np.asarray(sd.valid)
    assert ok.sum() >= 0.9 * n, ok.sum()
    ur = np.asarray(sd.u_right)[ok]
    err = np.abs(ur - (xs[ok] - d_true))
    assert np.median(err) < 0.25, np.median(err)
    depth = np.asarray(sd.depth)[ok]
    assert np.allclose(depth, bf / (xs[ok] - ur), atol=1e-4)


def test_depth_from_rgbd():
    rng = np.random.default_rng(1)
    Ht, Wt = 120, 160
    dm = rng.uniform(0.5, 5.0, (Ht, Wt)).astype(np.float32)
    dm[:, :20] = 0.0  # invalid strip
    n = 32
    xs, ys, pm1, mk = _grid_features(rng, n, Wt, Ht, margin=5)
    feats = mk(np.stack([xs, ys], -1), pm1)
    bf = 25.0
    sd = stereo_ops.depth_from_rgbd(feats, jnp.asarray(dm), bf)
    d_expect = dm[np.round(ys).astype(int), np.round(xs).astype(int)]
    ok = d_expect > 0
    assert np.array_equal(np.asarray(sd.valid), ok)
    assert np.allclose(np.asarray(sd.depth)[ok], d_expect[ok])
    assert np.allclose(
        np.asarray(sd.u_right)[ok], xs[ok] - bf / d_expect[ok], atol=1e-4
    )


class StereoFeatureSim(FeatureSim):
    """FeatureSim + per-feature stereo depth/u_right channels."""

    def __init__(self, bf=CAM_S.bf, depth_noise=0.0, ur_noise=0.15,
                 max_depth=12.0, **kw):
        super().__init__(**kw)
        self.bf = bf
        self.ur_noise = ur_noise
        self.max_depth = max_depth

    def stereo_frame(self, p_wb, Rwb) -> FrameData:
        fd = super().frame(p_wb, Rwb)
        # true depths of the non-clutter features: z in camera frame
        Rcw = self.ext.Rbc.T @ np.asarray(Rwb).T
        tcw = -Rcw @ (np.asarray(p_wb) + np.asarray(Rwb) @ self.ext.pbc)
        uv = np.asarray(fd.xy_und)
        valid = np.asarray(fd.feats.valid)
        # recover each feature's depth by re-projecting the cloud is
        # overkill; use the pinhole inverse through the true uv and the
        # plane of the landmark: simpler — recompute from landmark match.
        # FeatureSim doesn't expose per-feature landmark ids, so estimate
        # depth by intersecting nothing: instead, regenerate observed z
        # from the cloud points nearest in pixel space.
        Pc_all = self.cloud @ Rcw.T + tcw
        z_all = Pc_all[:, 2]
        vis = z_all > 0.2
        uv_all = np.stack(
            [458.0 * Pc_all[:, 0] / np.maximum(z_all, 1e-6) + 367.0,
             457.0 * Pc_all[:, 1] / np.maximum(z_all, 1e-6) + 248.0], -1)
        depth = np.full(len(uv), -1.0, np.float32)
        for i in np.where(valid)[0]:
            d2 = np.sum((uv_all - uv[i]) ** 2, -1)
            d2[~vis] = np.inf
            j = int(np.argmin(d2))
            if d2[j] < 2.0 and z_all[j] < self.max_depth:
                depth[i] = z_all[j]
        u_right = np.where(
            depth > 0,
            uv[:, 0] - self.bf / np.maximum(depth, 1e-6)
            + self.rng.normal(0, self.ur_noise, len(uv)),
            -1.0,
        ).astype(np.float32)
        return FrameData(
            feats=fd.feats, xy_und=fd.xy_und,
            u_right=jnp.asarray(u_right),
            depth=jnp.asarray(np.where(depth > 0, depth, -1.0)),
        )


def test_stereo_e2e_synthetic():
    traj = synthetic.circle_trajectory(duration=8.0, imu_rate=200.0)
    sim = StereoFeatureSim()
    cap = ma.Capacities(max_kfs=40, max_lms=4096, n_feat=N_FEAT)
    sys_ = StereoSystem(CAM_S, W, H, cap=cap, local_window=5, fixed_window=6,
                        min_init_features=150)

    stride = 10
    for k in range(0, 1600, stride):
        ts = float(traj.t[k])
        fd = sim.stereo_frame(traj.p[k], traj.Rwb[k])
        st = sys_.track_features(fd, ts)
        assert sys_.state != "LOST", f"lost at frame {k}: {st}"

    assert sys_.state == OK
    assert int(sys_.map.n_kfs) >= 4
    ftraj = sys_.frame_trajectory()
    est_ts = np.array([t for t, _, _ in ftraj])
    est_c = np.array([(-R.T @ t) for _, R, t in ftraj])
    rmse, scale, _ = evaluate.ate_rmse(
        est_ts, est_c, np.asarray(traj.t), np.asarray(traj.p)
    )
    # stereo is metric: the Sim3 alignment must come out at scale ~1
    assert abs(scale - 1.0) < 0.03, scale
    assert rmse < 0.06, (rmse, scale)
