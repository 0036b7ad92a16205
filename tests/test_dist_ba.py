"""Distributed Schur BA on a virtual 8-device mesh must match the
single-device solver (same problem, same schedule) to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from viorb_tpu.io import synthetic
from viorb_tpu.parallel import dist_ba
from viorb_tpu.solver import ba
from viorb_tpu.solver.ba import BAObservations, Camera, VisionBAState

CAM = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)


def make_problem(K=8, L=512, noise_px=0.5, pos_noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    cloud = synthetic.landmark_cloud(rng, n=L)
    traj = synthetic.circle_trajectory(duration=4.0, imu_rate=50.0)
    ext = synthetic.Extrinsics(Rbc=synthetic.euroc_like_extrinsics().Rbc, pbc=np.zeros(3))
    idx = np.linspace(0, len(traj.t) - 1, K).astype(int)

    cams, lms, uvs = [], [], []
    Rcw_list, tcw_list = [], []
    for ki, k in enumerate(idx):
        Rwb, p = traj.Rwb[k], traj.p[k]
        Rcw = ext.Rbc.T @ Rwb.T
        tcw = -Rcw @ p
        Rcw_list.append(Rcw)
        tcw_list.append(tcw)
        Pc = cloud @ Rcw.T + tcw
        uv = np.stack(
            [CAM.fx * Pc[:, 0] / Pc[:, 2] + CAM.cx, CAM.fy * Pc[:, 1] / Pc[:, 2] + CAM.cy], -1
        )
        vis = (Pc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 752) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        for l in np.where(vis)[0]:
            cams.append(ki)
            lms.append(l)
            uvs.append(uv[l] + rng.normal(0, noise_px, 2))

    cam_idx = np.array(cams, np.int32)
    lm_idx = np.array(lms, np.int32)
    uv = np.array(uvs, np.float64)
    valid = np.ones(len(cams), bool)

    state = VisionBAState(
        Rcw=jnp.asarray(np.array(Rcw_list)),
        tcw=jnp.asarray(np.array(tcw_list)),
        points=jnp.asarray(cloud + rng.normal(0, pos_noise, cloud.shape)),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    return state, cam_idx, lm_idx, uv, valid, fixed, cloud


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dist_ba_matches_single_device():
    state, cam_idx, lm_idx, uv, valid, fixed, cloud = make_problem()
    L = state.points.shape[0]
    n_shards = 8

    obs_sh, dropped = dist_ba.partition_observations(
        cam_idx, lm_idx, uv, np.ones(len(cam_idx)), valid, L, n_shards,
        obs_per_shard=int(np.ceil(len(cam_idx) / n_shards)) + 64,
    )
    assert dropped == 0

    # single-device reference on the identically-permuted problem
    lm_per_shard = L // n_shards
    shard = np.asarray(obs_sh.lm_idx).reshape(n_shards, -1)
    glob_lm = shard + (np.arange(n_shards) * lm_per_shard)[:, None]
    obs_ref = BAObservations(
        cam_idx=obs_sh.cam_idx,
        lm_idx=jnp.asarray(glob_lm.reshape(-1)),
        uv=obs_sh.uv,
        inv_sigma2=obs_sh.inv_sigma2,
        valid=obs_sh.valid,
    )
    out_ref, _ = ba.bundle_adjust_vision(state, obs_ref, CAM, fixed)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("lm",))
    out_d, _ = dist_ba.distributed_bundle_adjust_vision(state, obs_sh, CAM, fixed, mesh)

    np.testing.assert_allclose(np.asarray(out_d.Rcw), np.asarray(out_ref.Rcw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_d.tcw), np.asarray(out_ref.tcw), atol=5e-5)
    # landmark updates must agree with the single-device solver
    err = np.linalg.norm(np.asarray(out_d.points) - np.asarray(out_ref.points), axis=-1)
    assert np.max(err) < 1e-4, np.max(err)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dist_ba_reduces_cost():
    state, cam_idx, lm_idx, uv, valid, fixed, cloud = make_problem(pos_noise=0.2, seed=3)
    L = state.points.shape[0]
    n_shards = 8
    obs_sh, _ = dist_ba.partition_observations(
        cam_idx, lm_idx, uv, np.ones(len(cam_idx)), valid, L, n_shards,
        obs_per_shard=int(np.ceil(len(cam_idx) / n_shards)) + 64,
    )
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("lm",))
    out, obs2 = dist_ba.distributed_bundle_adjust_vision(state, obs_sh, CAM, fixed, mesh)

    lm_per_shard = L // n_shards
    glob_lm = np.asarray(obs_sh.lm_idx).reshape(n_shards, -1) + (
        np.arange(n_shards) * lm_per_shard
    )[:, None]
    obs_g = obs_sh._replace(lm_idx=jnp.asarray(glob_lm.reshape(-1)))
    c0 = float(ba._vision_chi2(state, obs_g, CAM, robust=False))
    c1 = float(ba._vision_chi2(out, obs_g._replace(valid=obs2.valid), CAM, robust=False))
    assert c1 < 0.1 * c0, (c0, c1)
