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


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dist_ba_pcg_solver_converges():
    """reduce_scatter + distributed-PCG camera solve (rcs_solver='pcg')
    must reach the same quality as the psum + replicated-Cholesky path:
    the inexact CG step only changes the LM trajectory, and the
    accept/reject guard keeps every accepted step a cost decrease."""
    state, cam_idx, lm_idx, uv, valid, fixed, cloud = make_problem(
        pos_noise=0.1, seed=5
    )
    L = state.points.shape[0]
    n_shards = 8
    obs_sh, _ = dist_ba.partition_observations(
        cam_idx, lm_idx, uv, np.ones(len(cam_idx)), valid, L, n_shards,
        obs_per_shard=int(np.ceil(len(cam_idx) / n_shards)) + 64,
    )
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("lm",))
    out, obs2 = dist_ba.distributed_bundle_adjust_vision(
        state, obs_sh, CAM, fixed, mesh, rcs_solver="pcg", n_cg_iters=64,
    )
    lm_per_shard = L // n_shards
    glob_lm = np.asarray(obs_sh.lm_idx).reshape(n_shards, -1) + (
        np.arange(n_shards) * lm_per_shard
    )[:, None]
    obs_g = obs_sh._replace(lm_idx=jnp.asarray(glob_lm.reshape(-1)))
    c0 = float(ba._vision_chi2(state, obs_g, CAM, robust=False))
    c1 = float(
        ba._vision_chi2(out, obs_g._replace(valid=obs2.valid), CAM, robust=False)
    )
    assert c1 < 0.1 * c0, (c0, c1)


# ----------------------------------------------------------------------------
# Distributed VI (NavState) BA
# ----------------------------------------------------------------------------


def _vi_problem_padded(n_shards=8):
    from test_vi_ba import build_vi_problem

    gt, obs, chain, Rcb, pcb = build_vi_problem()
    L = gt.points.shape[0]
    pad = (-L) % n_shards
    if pad:
        pts = jnp.concatenate([gt.points, jnp.zeros((pad, 3), gt.points.dtype)])
        gt = gt._replace(points=pts)
    return gt, obs, chain, Rcb, pcb


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dist_vi_ba_matches_single_device():
    from viorb_tpu.io.synthetic import GRAVITY_W
    from viorb_tpu.ops import imu as imu_ops
    from viorb_tpu.utils import lie

    noise = imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE, dtype=jnp.float64)
    grav = jnp.asarray(GRAVITY_W)
    gt, obs, chain, Rcb, pcb = _vi_problem_padded()
    K = gt.nav.p.shape[0]
    L = gt.points.shape[0]
    n_shards = 8

    rng = np.random.default_rng(7)
    pert = lambda s, shape: jnp.asarray(rng.normal(0, s, shape)).at[0].set(0.0)
    nav0 = gt.nav._replace(
        p=gt.nav.p + pert(0.04, (K, 3)),
        v=gt.nav.v + pert(0.08, (K, 3)),
        R=jax.vmap(lambda R, ph: R @ lie.so3_exp(ph))(gt.nav.R, pert(0.02, (K, 3))),
    )
    init = ba.VIBAState(
        nav=nav0, points=gt.points + jnp.asarray(rng.normal(0, 0.04, (L, 3)))
    )
    fixed = jnp.arange(K) == 0

    obs_sh, dropped = dist_ba.partition_observations(
        np.asarray(obs.cam_idx), np.asarray(obs.lm_idx), np.asarray(obs.uv),
        np.asarray(obs.inv_sigma2), np.asarray(obs.valid), L, n_shards,
        obs_per_shard=int(np.ceil(obs.uv.shape[0] / n_shards)) + 64,
    )
    assert dropped == 0

    # single-device reference on the identically-permuted problem
    lm_per_shard = L // n_shards
    glob_lm = np.asarray(obs_sh.lm_idx).reshape(n_shards, -1) + (
        np.arange(n_shards) * lm_per_shard
    )[:, None]
    obs_ref = obs_sh._replace(lm_idx=jnp.asarray(glob_lm.reshape(-1)))
    out_ref, _ = ba.bundle_adjust_vi(
        init, obs_ref, chain, CAM, Rcb, pcb, grav, noise, fixed
    )

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("lm",))
    out_d, _ = dist_ba.distributed_bundle_adjust_vi(
        init, obs_sh, chain, CAM, Rcb, pcb, grav, noise, fixed, mesh
    )

    np.testing.assert_allclose(np.asarray(out_d.nav.p), np.asarray(out_ref.nav.p), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_d.nav.v), np.asarray(out_ref.nav.v), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_d.nav.R), np.asarray(out_ref.nav.R), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_d.nav.bg + out_d.nav.dbg),
        np.asarray(out_ref.nav.bg + out_ref.nav.dbg), atol=1e-5,
    )
    err = np.linalg.norm(np.asarray(out_d.points) - np.asarray(out_ref.points), axis=-1)
    assert np.max(err) < 5e-4, np.max(err)

    # and it actually solved the problem (near ground truth)
    gt_full, *_ = _vi_problem_padded()
    p_err = float(jnp.abs(out_d.nav.p - gt_full.nav.p).max())
    assert p_err < 0.02, p_err
