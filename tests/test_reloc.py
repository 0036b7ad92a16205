"""EPnP / PnP-RANSAC and relocalization tests.

Covers the reference's PnPsolver (src/PnPsolver.cc) + Tracking::
Relocalization (Tracking.cc:2565-2727) + post-reloc bias recomputation
(Tracking.cc:111-279) equivalents.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viorb_tpu.io import synthetic
from viorb_tpu.ops import bow, imu as imu_ops
from viorb_tpu.pipeline import relocalization as reloc
from viorb_tpu.pipeline.tracking import FrameData
from viorb_tpu.solver import pnp
from viorb_tpu.solver.ba import Camera
from viorb_tpu.utils import lie

from test_loop_closing import build_loop_map, CAM


def _random_pose(rng):
    phi = rng.normal(0, 0.5, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    t = rng.normal(0, 0.5, 3) + np.array([0, 0, 4.0])
    return R, t


def _project(R, t, P, cam):
    pc = P @ R.T + t
    return np.stack(
        [cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
         cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1), pc[:, 2]


def test_epnp_exact():
    rng = np.random.default_rng(0)
    cam = Camera(fx=450.0, fy=450.0, cx=320.0, cy=240.0)
    R, t = _random_pose(rng)
    P = rng.normal(0, 1.0, (60, 3))
    uv, z = _project(R, t, P, cam)
    assert (z > 0).all()
    w = jnp.ones(60)
    R_e, t_e = pnp.epnp(jnp.asarray(P), jnp.asarray(uv), w, cam)
    assert np.linalg.norm(np.asarray(R_e) - R) < 1e-3
    assert np.linalg.norm(np.asarray(t_e) - t) < 1e-3


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(1)
    cam = Camera(fx=450.0, fy=450.0, cx=320.0, cy=240.0)
    R, t = _random_pose(rng)
    N = 120
    P = rng.normal(0, 1.0, (N, 3))
    uv, z = _project(R, t, P, cam)
    uv += rng.normal(0, 0.3, uv.shape)
    n_out = 40
    out_idx = rng.choice(N, n_out, replace=False)
    uv[out_idx] += rng.uniform(30, 200, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    res = pnp.pnp_ransac(
        jnp.asarray(P, jnp.float32), jnp.asarray(uv, jnp.float32),
        jnp.ones(N, bool), jnp.ones(N, jnp.float32), cam,
        jax.random.PRNGKey(0),
    )
    assert bool(res.success)
    assert np.linalg.norm(np.asarray(res.Rcw) - R) < 0.02
    assert np.linalg.norm(np.asarray(res.tcw) - t) < 0.05
    inl = np.asarray(res.inliers)
    assert inl[out_idx].sum() <= 2  # outliers rejected
    assert int(res.n_inliers) > 60


@pytest.fixture(scope="module")
def loop_map():
    return build_loop_map()


def test_relocalize_on_map(loop_map):
    m, truth = loop_map
    n = truth["n_all"]
    index = bow.DescriptorIndex(m.assoc.shape[0])
    for k in range(n):
        index.add(k, m.kfs.feat_pm1[k], m.kfs.feat_valid[k])

    # query frame = keyframe 5's features perturbed (as if re-observed)
    k = 5
    from viorb_tpu.ops.orb import OrbFeatures
    N = m.assoc.shape[1]
    feats = OrbFeatures(
        xy=m.kfs.feat_xy[k],
        response=jnp.ones(N),
        octave=jnp.zeros(N, jnp.int32),
        angle=m.kfs.feat_angle[k],
        sigma2=m.kfs.feat_sigma2[k],
        desc=jnp.zeros((N, 32), jnp.uint8),
        desc_pm1=m.kfs.feat_pm1[k],
        valid=m.kfs.feat_valid[k],
    )
    frame = FrameData(feats=feats, xy_und=m.kfs.feat_xy[k])
    out = reloc.relocalize(m, frame, CAM, index, jax.random.PRNGKey(2))
    assert out is not None
    assert out.n_inliers >= 50
    assert np.linalg.norm(out.Rcw - np.asarray(m.kfs.Rcw[k])) < 0.01
    assert np.linalg.norm(out.tcw - np.asarray(m.kfs.tcw[k])) < 0.05


def test_recompute_bias_after_reloc():
    """Known biases injected into IMU samples are recovered from the
    20-frame window + true poses (the reloc'd vision poses)."""
    traj = synthetic.circle_trajectory(duration=2.0, imu_rate=100.0)
    noise = imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE)
    bg_true = np.array([0.02, -0.01, 0.015])
    ba_true = np.array([0.05, 0.08, -0.04])
    gw = synthetic.GRAVITY_W

    F = 20  # frames
    per = (len(traj.t) - 1) // F
    Rwb = traj.Rwb[::per][:F]
    pwb = traj.p[::per][:F]
    pres = []
    for i in range(F - 1):
        s = slice(i * per, (i + 1) * per)
        g = traj.gyro[s] + bg_true
        a = traj.acc[s] + ba_true
        dt = np.diff(traj.t[i * per:(i + 1) * per + 1])
        pres.append(imu_ops.preintegrate(
            jnp.asarray(g, jnp.float64), jnp.asarray(a, jnp.float64),
            jnp.asarray(dt, jnp.float64), jnp.zeros(3, jnp.float64),
            jnp.zeros(3, jnp.float64), noise))
    pre = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)

    bg, dba, v_last = reloc.recompute_bias_after_reloc(
        jnp.asarray(Rwb), jnp.asarray(pwb), pre, jnp.asarray(gw), noise
    )
    assert np.allclose(np.asarray(bg), bg_true, atol=2e-3), bg
    assert np.allclose(np.asarray(dba), ba_true, atol=0.03), dba
    v_true = traj.v[(F - 1) * per]
    assert np.allclose(np.asarray(v_last), v_true, atol=0.05), (v_last, v_true)
