"""Distributed Schur-complement bundle adjustment over a jax.sharding.Mesh.

The reference runs all optimization single-process on one CPU
(`/root/reference/src/Optimizer.cc` + g2o). For TPU scale-out we shard the
*landmark* axis — the SLAM analog of data parallelism, and the axis that
actually grows with map size (keyframes are culled to stay sparse;
landmarks are 10-100x more numerous).

Partitioning invariant: every observation lives on the shard that owns its
landmark. Host-side preprocessing (`partition_observations`) sorts/pads the
observation table accordingly. Consequences:

  - landmark Hessian blocks H_ll (3x3) and their Cholesky factors are
    shard-local — ZERO communication;
  - the square-root fill-in S_fill = sum_l F_l F_l^T decomposes exactly
    over shards (each l is whole on one shard) — the reduced camera system
    is assembled with ONE psum of a (K*D, K*D) matrix + rhs per LM
    iteration. Over ICI that is microseconds for the windows the reference
    uses (K*D <= a few hundred);
  - the replicated dense Cholesky solve of S is deterministic on every
    shard (no broadcast needed);
  - landmark back-substitution is shard-local.

This is the "assemble the reduced camera system with collectives, fix
boundary state" strategy from SURVEY.md section 7, with cameras treated as
replicated boundary state. Accuracy is bit-identical to the single-device
solver up to float reassociation in the psum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver import ba, factors, schur
from ..solver.ba import BAObservations, Camera, VisionBAState


def partition_observations(
    cam_idx: np.ndarray,
    lm_idx: np.ndarray,
    uv: np.ndarray,
    inv_sigma2: np.ndarray,
    valid: np.ndarray,
    n_landmarks: int,
    n_shards: int,
    obs_per_shard: int,
):
    """Host-side: route each observation to the shard owning its landmark.

    Landmark l lives on shard l // (n_landmarks // n_shards) (contiguous
    blocks — covisible landmarks are created together so this keeps
    locality). Returns arrays of shape (n_shards * obs_per_shard, ...) with
    lm_idx rewritten to SHARD-LOCAL indices, plus the landmark permutation
    identity (contiguous blocks need none).
    """
    assert n_landmarks % n_shards == 0
    lm_per_shard = n_landmarks // n_shards
    shard_of = lm_idx // lm_per_shard
    O = n_shards * obs_per_shard

    out_cam = np.zeros((n_shards, obs_per_shard), np.int32)
    out_lm = np.zeros((n_shards, obs_per_shard), np.int32)
    out_uv = np.zeros((n_shards, obs_per_shard, 2), uv.dtype)
    out_w = np.ones((n_shards, obs_per_shard), inv_sigma2.dtype)
    out_valid = np.zeros((n_shards, obs_per_shard), bool)
    dropped = 0
    for s in range(n_shards):
        sel = np.where(valid & (shard_of == s))[0]
        if len(sel) > obs_per_shard:
            dropped += len(sel) - obs_per_shard
            sel = sel[:obs_per_shard]
        n = len(sel)
        out_cam[s, :n] = cam_idx[sel]
        out_lm[s, :n] = lm_idx[sel] - s * lm_per_shard
        out_uv[s, :n] = uv[sel]
        out_w[s, :n] = inv_sigma2[sel]
        out_valid[s, :n] = True
    obs = BAObservations(
        cam_idx=jnp.asarray(out_cam.reshape(O)),
        lm_idx=jnp.asarray(out_lm.reshape(O)),
        uv=jnp.asarray(out_uv.reshape(O, 2)),
        inv_sigma2=jnp.asarray(out_w.reshape(O)),
        valid=jnp.asarray(out_valid.reshape(O)),
    )
    return obs, dropped


def _shard_lm_iters(
    Rcw, tcw, points_local, obs_local: BAObservations,
    cam: Camera, fixed_cam_mask, lam0, n_iters: int, robust: bool,
    axis: str,
):
    """LM iterations executed inside shard_map: cameras replicated,
    points/observations shard-local; one psum per iteration."""
    K = Rcw.shape[0]
    L_loc = points_local.shape[0]
    D = 6
    fixed_dof = jnp.repeat(fixed_cam_mask, D)

    def chi2_of(state):
        c = ba._vision_chi2(state, obs_local, cam, robust)
        return jax.lax.psum(c, axis)

    def body(_, carry):
        state, lam, cost = carry
        err, J_pose, J_point, w, _, _ = ba._linearize_vision(state, obs_local, cam, robust)
        sys = schur.ObsSystem(
            J_c=J_pose, J_p=J_point, r=-err, w=w,
            cam_idx=obs_local.cam_idx, lm_idx=obs_local.lm_idx,
        )
        S, b, H_ll_inv, b_l, B = schur.build_reduced_camera_system(
            sys, K, L_loc, D, lam, fixed_cam_mask
        )
        # the ONLY cross-shard communication: assemble the global RCS
        S = jax.lax.psum(S, axis)
        b = jax.lax.psum(b, axis)
        dx = schur.solve_cameras(S, b, lam, fixed_dof)  # replicated
        dx_cam = dx.reshape(K, D)
        dx_pts = schur.back_substitute_landmarks(
            B, obs_local.cam_idx, obs_local.lm_idx, H_ll_inv, b_l, dx_cam, L_loc
        )
        cand = ba._apply_update_vision(state, dx_cam, dx_pts)
        new_cost = chi2_of(cand)
        accept = new_cost < cost
        state = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), cand, state)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return state, lam, cost

    state = VisionBAState(Rcw=Rcw, tcw=tcw, points=points_local)
    cost0 = chi2_of(state)
    state, lam, cost = jax.lax.fori_loop(0, n_iters, body, (state, lam0, cost0))
    return state.Rcw, state.tcw, state.points, lam, cost


def distributed_bundle_adjust_vision(
    state: VisionBAState,
    obs: BAObservations,  # from partition_observations (lm_idx shard-local)
    cam: Camera,
    fixed_cam_mask: jax.Array,
    mesh: Mesh,
    axis: str = "lm",
    n_rounds: int = 2,
    iters_per_round: tuple = (5, 10),
    robust_rounds: tuple = (True, False),
    lambda_init: float = 1e-4,
):
    """Drop-in distributed variant of ba.bundle_adjust_vision.

    state.points and all obs fields are sharded along `axis` of `mesh`;
    Rcw/tcw are replicated. Returns (state, obs) with the same shardings.
    """
    n_shards = mesh.shape[axis]
    L = state.points.shape[0]
    assert L % n_shards == 0, (L, n_shards)

    repl = NamedSharding(mesh, P())
    shd1 = NamedSharding(mesh, P(axis))
    state = VisionBAState(
        Rcw=jax.device_put(state.Rcw, repl),
        tcw=jax.device_put(state.tcw, repl),
        points=jax.device_put(state.points, shd1),
    )
    obs = jax.tree.map(lambda a: jax.device_put(a, shd1), obs)

    def make_round(iters: int, robust: bool):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), jax.tree.map(lambda _: P(axis), obs), P()),
            out_specs=(P(), P(), P(axis), P(), P()),
            check_vma=False,
        )
        def run_round(Rcw, tcw, pts, obs_local, lam):
            return _shard_lm_iters(
                Rcw, tcw, pts, obs_local, cam, fixed_cam_mask, lam, iters, robust, axis
            )

        return run_round

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), jax.tree.map(lambda _: P(axis), obs)),
        out_specs=P(axis),
        check_vma=False,
    )
    def gate(Rcw, tcw, pts, obs_local):
        st = VisionBAState(Rcw=Rcw, tcw=tcw, points=pts)
        return ba.gate_outliers_vision(st, obs_local, cam).valid

    lam = jnp.asarray(lambda_init, state.points.dtype)
    Rcw, tcw, pts = state.Rcw, state.tcw, state.points
    for rnd in range(n_rounds):
        Rcw, tcw, pts, lam, _ = make_round(iters_per_round[rnd], robust_rounds[rnd])(
            Rcw, tcw, pts, obs, lam
        )
        if rnd < n_rounds - 1:
            obs = obs._replace(valid=gate(Rcw, tcw, pts, obs))
    return VisionBAState(Rcw=Rcw, tcw=tcw, points=pts), obs
