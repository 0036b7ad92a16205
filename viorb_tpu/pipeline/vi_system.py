"""Monocular visual-inertial system: the MonoVI mode of the reference.

Extends the vision-only MonoSystem with:

- per-keyframe-interval IMU storage + batched re-preintegration after bias
  updates (KeyFrame::ComputePreInt, LocalMapping.cc:1047-1057);
- the VIO initialization state machine (TryInitVIO with known Tbc, or
  TryInitVIOWithoutPreCalibration with online Rbc/pbc estimation +
  convergence monitors);
- NavState tracking once initialized: IMU prediction
  (Tracking::PredictNavStateByIMU, Tracking.cc:349-394), VI pose
  optimization vs the last keyframe or vs the last frame with a 15-dim
  marginalization prior (Optimizer.cc:326-597, 600-977), and VI local-map
  optimization (TrackLocalMapWithIMU, Tracking.cc:567-662);
- visual-inertial local BA over the temporal keyframe window
  (LocalBundleAdjustmentNavState, Optimizer.cc:980-1449);
- map scale update on successful init (Map::UpdateScale, Map.cc:37-55).

Timing model: `track(frame, imu_chunk, ts)` receives the IMU samples with
timestamps in (t_prev_frame, t_frame] — the MsgSynchronizer pairing
(Examples/ROS/ORB_VIO/src/MsgSync/MsgSynchronizer.cc:130-160) is the
caller's job (io/euroc.py provides it for datasets).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..map import arrays as ma
from ..ops import imu as imu_ops
from ..solver import ba, pose as pose_opt
from ..solver.ba import Camera
from ..utils import lie
from . import local_mapping, relocalization, tracking, vio_init
from .system import LOST, NOT_INITIALIZED, OK, MonoSystem
from .tracking import FrameData


def navstate_to_camera(ns: imu_ops.NavState, Rcb, pcb):
    """Tcw from a body NavState through the extrinsics (Frame::
    UpdatePoseFromNS): Rcw = Rcb Rwb^T, tcw = -Rcw Pwb + pcb."""
    Rcw = Rcb @ jnp.swapaxes(ns.R, -1, -2)
    tcw = -jnp.einsum("...ij,...j->...i", Rcw, ns.p) + pcb
    return Rcw, tcw


class ViFrameStepOut(NamedTuple):
    """Everything one VI-tracked frame produces, in a single device program."""

    ns: imu_ops.NavState  # optimized current-frame NavState
    marg: jax.Array  # (15, 15) marginal information (next frame's prior)
    Rcw: jax.Array
    tcw: jax.Array
    assoc: jax.Array  # (N,) final inlier-masked associations
    Rcr: jax.Array  # pose relative to the reference keyframe
    tcr: jax.Array
    scalars: jax.Array  # (4,) int32 [n_inliers, n_first_pass, used_ref_kf, n_ref_matches]


def fused_vi_frame_step(
    m: ma.MapArrays,
    frame: FrameData,
    imu: tuple,  # (gyro (M,3), acc (M,3), dt (M,)) zero-padded samples
    ns_base: imu_ops.NavState,  # last KF (vs_kf) or last frame (vs frame)
    Rcw_last: jax.Array,
    tcw_last: jax.Array,
    assoc_last: jax.Array,
    angle_last: jax.Array,
    gravity: jax.Array,
    Rcb: jax.Array,
    pcb: jax.Array,
    bg: jax.Array,
    ba_: jax.Array,
    noise: imu_ops.ImuNoise,
    prior_ns: imu_ops.NavState,  # last frame's 15-dim prior (vs-frame mode)
    prior_info: jax.Array,  # (15, 15)
    ref_pose_kf,  # () int32: newest keyframe slot (trajectory anchor)
    ref_kf,  # () int32: newest VALID keyframe (fallback rung + nRefMatches)
    min_obs,  # () int32
    cam: Camera,
    width: float,
    height: float,
    x_min: float = 0.0,
    y_min: float = 0.0,
    vs_kf: bool = True,
) -> tuple[ViFrameStepOut, ma.MapArrays]:
    """One whole VI-tracked frame as a single XLA program.

    Fuses the reference's per-frame MonoVI sequence — IMU preintegration
    since the last keyframe/frame (Tracking.cc:664-721), NavState
    prediction (PredictNavStateByIMU, Tracking.cc:349-394), projection
    matching, the TrackReferenceKeyFrameWithIMU fallback rung
    (Tracking.cc:508-565), VI pose optimization vs keyframe or vs frame
    with the marginalization prior (Optimizer.cc:326-597 / 600-977), the
    local-map pass + re-optimization (TrackLocalMapWithIMU,
    Tracking.cc:567-662) and relative-pose bookkeeping — into one dispatch
    with one async scalar fetch. vs_kf is the host's bMapUpdated switch
    (Tracking.cc:1049-1062): two compiled variants, chosen per frame.
    """
    from jax import lax

    # one common dtype across both cond branches (x64 test mode mixes f32
    # NavStates with f64 map tables otherwise)
    dtp = m.kfs.Rcw.dtype
    Rcw_last = jnp.asarray(Rcw_last, dtp)
    tcw_last = jnp.asarray(tcw_last, dtp)

    g, a, dt = imu
    pre_used = imu_ops.preintegrate(g, a, dt, bg, ba_, noise)
    ns_pred = imu_ops.propagate_navstate(ns_base, pre_used, gravity)
    Rcw_pred, tcw_pred = navstate_to_camera(ns_pred, Rcb, pcb)
    Rcw_pred = jnp.asarray(Rcw_pred, dtp)
    tcw_pred = jnp.asarray(tcw_pred, dtp)
    Rl_inv, tl_inv = lie.se3_inv(Rcw_last, tcw_last)
    R_vel, t_vel = lie.se3_mul(Rcw_pred, tcw_pred, Rl_inv, tl_inv)

    mm = tracking.track_motion_model(
        m, frame, Rcw_last, tcw_last, assoc_last, R_vel, t_vel, cam,
        angle_last=angle_last,
    )
    mm = mm._replace(n_inliers=mm.n_inliers.astype(jnp.int32))

    def fallback():
        # TrackReferenceKeyFrameWithIMU: BoW-style match vs the reference
        # keyframe's landmarks; optimization stays inertial below
        assoc_ref = tracking.match_reference_keyframe(m, frame, ref_kf)
        return tracking.TrackOutput(
            Rcw=Rcw_pred, tcw=tcw_pred, assoc=assoc_ref,
            n_inliers=jnp.sum(assoc_ref >= 0).astype(jnp.int32),
        )

    use_fallback = mm.n_inliers < 10
    out = lax.cond(use_fallback, fallback, lambda: mm)

    def vi_optimize(prob):
        # the reference's 4 re-gating rounds x 10 LM iterations
        # (Optimizer.cc:326-597) — the optimizers' defaults
        if vs_kf:
            return pose_opt.pose_optimize_vi_kf(ns_pred, ns_base, prob, cam)
        ns_o, _ns_last, inl_, n_, marg_ = pose_opt.pose_optimize_vi_frame(
            ns_pred, ns_base, prior_ns, prior_info, prob, cam
        )
        return ns_o, inl_, n_, marg_

    def make_prob(assoc):
        return pose_opt.VIPoseProblem(
            obs=pose_opt.PoseObs(
                pts=m.lms.pos[jnp.clip(assoc, 0)],
                uv=frame.xy_und,
                inv_sigma2=1.0 / frame.feats.sigma2,
                valid=(assoc >= 0) & frame.feats.valid,
            ),
            pre=pre_used,
            gravity=gravity,
            Rcb=Rcb,
            pcb=pcb,
            noise=noise,
        )

    ns_opt, inl, _n1, _marg1 = vi_optimize(make_prob(out.assoc))

    Rcw1, tcw1 = navstate_to_camera(ns_opt, Rcb, pcb)
    assoc1 = jnp.where(inl, out.assoc, -1)
    out2, m2 = tracking.track_local_map(
        m, frame, Rcw1, tcw1, assoc1, cam, width, height,
        x_min=x_min, y_min=y_min,
    )
    ns_opt, inl2, n_inl2, marg = vi_optimize(make_prob(out2.assoc))
    ref_cnt = tracking.ref_kf_tracked_landmarks(m2, ref_kf, min_obs)

    Rcw, tcw = navstate_to_camera(ns_opt, Rcb, pcb)
    kref = jnp.asarray(ref_pose_kf, jnp.int32)
    Rr_inv, tr_inv = lie.se3_inv(m2.kfs.Rcw[kref], m2.kfs.tcw[kref])
    Rcr, tcr = lie.se3_mul(Rcw, tcw, Rr_inv, tr_inv)

    scalars = jnp.stack(
        [n_inl2, out.n_inliers, use_fallback.astype(jnp.int32), ref_cnt]
    ).astype(jnp.int32)
    return (
        ViFrameStepOut(
            ns=ns_opt, marg=marg, Rcw=Rcw, tcw=tcw,
            assoc=jnp.where(inl2, out2.assoc, -1),
            Rcr=Rcr, tcr=tcr, scalars=scalars,
        ),
        m2,
    )


class ViMonoSystem(MonoSystem):
    """Monocular + IMU SLAM (reference runningMode==1)."""

    def __init__(
        self,
        cam: Camera,
        width: int,
        height: int,
        cap: ma.Capacities = ma.Capacities(),
        noise: imu_ops.ImuNoise | None = None,
        Rbc: np.ndarray | None = None,
        pbc: np.ndarray | None = None,
        estimate_extrinsics: bool = False,
        imu_per_interval: int = 512,
        min_init_kfs: int = 12,
        gravity_mag: float = vio_init.GRAVITY,
        force_init_after_s: float = 15.0,
        vio_tmp_path: str = "",  # test.InitVIOTmpPath: per-attempt dumps
        vision_aid_when_imu_fails: bool = False,
        random_matrix_first_vio_init: bool = False,
        **kw,
    ):
        # VI default keyframe cadence floor: the reference's commented-out
        # cTimeGap uses 0.1 s pre-VINS (Tracking.cc:2159-2166), and its
        # busy-LocalMapping throttle enforces roughly this in practice —
        # without it the synchronous pipeline inserts at frame rate and the
        # VIO-init least-squares see only 0.05 s preintegration baselines
        kw.setdefault("min_kf_gap_s", 0.1)
        super().__init__(cam, width, height, cap=cap, **kw)
        self.noise = noise or imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE)
        self.estimate_extrinsics = estimate_extrinsics or Rbc is None
        self.Rcb = jnp.asarray(Rbc.T, jnp.float32) if Rbc is not None else jnp.eye(3, dtype=jnp.float32)
        self.pcb = (
            jnp.asarray(-Rbc.T @ pbc, jnp.float32) if Rbc is not None else jnp.zeros(3, jnp.float32)
        )
        self.gravity_mag = gravity_mag
        self.min_init_kfs = min_init_kfs
        self.force_init_after_s = force_init_after_s

        self.vins_inited = False
        self.gravity = jnp.zeros(3, jnp.float32)
        self.scale = 1.0

        # per-KF-interval IMU tables (interval j = samples between KF j-1
        # and KF j), padded to imu_per_interval
        M = imu_per_interval
        K = cap.max_kfs
        self.imu_gyro = np.zeros((K, M, 3), np.float32)
        self.imu_acc = np.zeros((K, M, 3), np.float32)
        self.imu_dt = np.zeros((K, M), np.float32)
        self.imu_n = np.zeros((K,), np.int32)
        self.pre = imu_ops.PreintState.zero((K,), jnp.float32)
        self.bg = jnp.zeros(3, jnp.float32)
        self.ba_ = jnp.zeros(3, jnp.float32)

        self._imu_buf: list = []  # (gyro, acc, dt) since last KF
        self._imu_since_frame: list = []  # since last tracked frame
        self._init_t0 = None
        self._q_rcb_prev = None
        self._sgp_prev = None
        self._ref_prev = None
        self.mon_rbc = vio_init.ConvergenceMonitor(0.1)
        self.mon_pbc = vio_init.ConvergenceMonitor(0.02)
        self.vio_tmp_path = vio_tmp_path
        self.vision_aid_when_imu_fails = vision_aid_when_imu_fails
        # CreateRandomMatrixLastForFirstVIOInit (configparam.cc:119-124):
        # seed the FIRST extrinsic-rotation estimate's exponential row
        # weighting from a random quaternion instead of unweighted rows
        self.random_matrix_first_vio_init = random_matrix_first_vio_init
        self._init_rng = np.random.default_rng(hash("rcb_init") & 0xFFFF)

        # VI tracking state
        self.ns: imu_ops.NavState | None = None  # current frame NavState
        self.ns_kf: imu_ops.NavState | None = None  # reference KF NavState
        # last tracked frame's 15-dim marginalization prior
        # (Frame::mNavStatePrior / mMargCovInv, Frame.h:102-103) — consumed
        # by the frame-to-frame VI pose optimization when the map did not
        # change between frames (Tracking.cc:1049-1062 bMapUpdated=false)
        self.prior_ns: imu_ops.NavState | None = None
        self.prior_info = jnp.zeros((15, 15), jnp.float32)
        # map-updated flag: the reference polls LocalMapping/LoopClosing
        # update flags (Tracking.cc:1049-1062); the synchronous pipeline
        # sets it exactly where the map mutates (KF insert, loop, init,
        # reloc) and consumes it once per tracked frame
        self._map_updated = True
        # post-relocalization recovery window (Tracking.cc:111-279):
        # 20 vision-tracked frames buffered to re-estimate bg/ba/velocity
        self._recovery: dict | None = None
        self.reloc_window = 20

        # VI kernels shared across instances (pipeline/kernels.py); the VI
        # window BA stays ONE jitted program — calling ba.bundle_adjust_vi
        # eagerly would compile each fori_loop as a standalone scan
        # primitive with captured-constant operands (slower dispatch, and
        # XLA:CPU aborts on that form at image-e2e problem sizes).
        from . import kernels

        vk = kernels.vi_kernels(cam, tuple(self.bounds))
        self._vk = vk
        self._vi_pose_kf = vk.pose_kf
        self._vi_pose_frame = vk.pose_frame
        self._match_ref_kf = vk.match_ref_kf
        self._vi_ba = (
            lambda state, obs, chain, Rcb, pcb, gravity, fixed: vk.vi_ba(
                state, obs, chain, Rcb, pcb, gravity, self.noise, fixed
            )
        )

    # ------------------------------------------------------------------
    def track(self, frame: FrameData, imu_chunk, ts: float) -> dict:
        """imu_chunk: (n, 7) rows [gx, gy, gz, ax, ay, az, dt]."""
        imu_chunk = np.asarray(imu_chunk, np.float32).reshape(-1, 7)

        if not self.vins_inited and self.state == NOT_INITIALIZED:
            # resolve the PREVIOUS frame's deferred two-view attempt
            # BEFORE appending this frame's IMU chunk: at this point the
            # buffer holds exactly the samples up to the attempt's frame,
            # which is the split _create_initial_map consumes as keyframe
            # interval 1 (the reference splits at KF1's stamp,
            # Tracking.cc:1730-1758)
            prev_init = self.init_frame
            inited_now = self._resolve_pending_init()
            if self.state == NOT_INITIALIZED and self.init_frame is not prev_init:
                # candidate moved to the attempt's frame: samples before
                # it belong to no keyframe interval
                self._imu_buf = []
            self._imu_buf.extend(imu_chunk)
            self._imu_since_frame = list(imu_chunk)
            if inited_now:
                return self._track(frame, ts)
            prev_init = self.init_frame
            st = super().track_features(frame, ts)
            if self.state == NOT_INITIALIZED and self.init_frame is not prev_init:
                self._imu_buf = []
            return st

        self._imu_buf.extend(imu_chunk)
        self._imu_since_frame = list(imu_chunk)

        if not self.vins_inited:
            return super().track_features(frame, ts)

        if self.state == LOST:
            return self._try_relocalize(frame, ts)
        if self._recovery is not None:
            return self._track_recovery(frame, ts)
        return self._track_vi(frame, ts)

    def reset(self):
        """Reset cascade including the VI state (Tracking::Reset clears the
        IMU buffers, VINS-init flags and NavStates, Tracking.cc:2729-2783)."""
        super().reset()
        self.vins_inited = False
        self.gravity = jnp.zeros(3, jnp.float32)
        self.scale = 1.0
        self.imu_gyro[:] = 0
        self.imu_acc[:] = 0
        self.imu_dt[:] = 0
        self.imu_n[:] = 0
        self.pre = imu_ops.PreintState.zero((self.imu_gyro.shape[0],), jnp.float32)
        self.bg = jnp.zeros(3, jnp.float32)
        self.ba_ = jnp.zeros(3, jnp.float32)
        self._imu_buf = []
        self._imu_since_frame = []
        self._init_t0 = None
        self._q_rcb_prev = None
        self._sgp_prev = None
        self._ref_prev = None
        self.mon_rbc = vio_init.ConvergenceMonitor(0.1)
        self.mon_pbc = vio_init.ConvergenceMonitor(0.02)
        self.ns = None
        self.ns_kf = None
        self.prior_ns = None
        self.prior_info = jnp.zeros((15, 15), jnp.float32)
        self._map_updated = True
        self._recovery = None

    # ------------------------------------------------------------------
    # Keyframe hook: store the IMU interval and run the VIO init attempt.
    # ------------------------------------------------------------------
    def _insert_keyframe(self, frame, ts, track_out, update_last=True,
                         imu_rows=None):
        kf_id = self._n_kfs_cache  # id the new KF will get
        self._store_imu_interval(kf_id, rows=imu_rows)
        super()._insert_keyframe(frame, ts, track_out, update_last=update_last)
        if not self.vins_inited and self._n_kfs_cache > max(
            self.min_init_kfs, self.local_window
        ):
            with self.times.stage("vio_init_attempt"):
                self._try_init_vio(ts)

    def _create_initial_map(self, frame, ts, match_res, init):
        super()._create_initial_map(frame, ts, match_res, init)
        # split the IMU buffer at the first KF's timestamp is already done
        # by construction: everything in the buffer belongs to interval 1
        self._store_imu_interval(1)
        self._init_t0 = None

    def _store_imu_interval(self, kf_id: int, rows=None):
        """Store the IMU interval ending at this keyframe. rows=None
        consumes the whole since-last-KF buffer (synchronous path);
        deferred insertion passes the explicit slice up to the keyframe's
        frame (samples after it stay buffered for the next interval)."""
        if rows is None:
            rows, self._imu_buf = self._imu_buf, []
        buf = np.asarray(rows, np.float32).reshape(-1, 7)
        M = self.imu_gyro.shape[1]
        n = min(len(buf), M)
        self.imu_gyro[kf_id, :n] = buf[:n, 0:3]
        self.imu_acc[kf_id, :n] = buf[:n, 3:6]
        self.imu_dt[kf_id, :n] = buf[:n, 6]
        self.imu_gyro[kf_id, n:] = 0
        self.imu_acc[kf_id, n:] = 0
        self.imu_dt[kf_id, n:] = 0
        self.imu_n[kf_id] = n
        self._repreintegrate()

    def _repreintegrate(self):
        """Batched ComputePreInt over all stored intervals with current
        biases — always at the FULL table shape: a `[:K]` slice would
        compile a fresh program for every new keyframe count (seconds per
        keyframe on the remote-TPU backend); empty intervals integrate to
        identity and are harmless."""
        mask = (
            np.arange(self.imu_gyro.shape[1])[None, :] < self.imu_n[:, None]
        )
        self.pre = self._vk.repreint(
            jnp.asarray(self.imu_gyro),
            jnp.asarray(self.imu_acc),
            jnp.asarray(self.imu_dt),
            self.bg, self.ba_, self.noise, jnp.asarray(mask),
        )

    # ------------------------------------------------------------------
    # VIO initialization attempt (on each new keyframe until success).
    # ------------------------------------------------------------------
    def _dump_init(self, name: str, ts: float, values):
        """Append one per-attempt line to <vio_tmp_path>/<name>.txt — the
        reference's calibration-accuracy dump files (scale.txt, gw.txt,
        biasg/biasa.txt, R_bc_estimate.txt, p_bc_refined.txt,
        Processing_Time.txt; LocalMapping.cc:107-179,391-418)."""
        if not self.vio_tmp_path:
            return
        import os

        os.makedirs(self.vio_tmp_path, exist_ok=True)
        row = np.atleast_1d(np.asarray(values, np.float64)).ravel()
        with open(os.path.join(self.vio_tmp_path, f"{name}.txt"), "a") as f:
            f.write(f"{ts:.6f} " + " ".join(f"{v:.9g}" for v in row) + "\n")

    def _try_init_vio(self, ts: float) -> bool:
        """One VIO-initialization attempt, dispatched as ONE fixed-shape
        jitted program (kernels.init_attempt_fixed / init_attempt_calib) —
        the eager per-attempt chain recompiled ~35 shape-dependent ops per
        new keyframe count (13 s per attempt on the remote-TPU backend,
        round-4 profiling)."""
        import time as _time

        _t_attempt = _time.perf_counter()
        N = self._n_kfs_cache

        if self._init_t0 is None:
            self._init_t0 = ts

        smask = jnp.asarray(
            np.arange(self.imu_gyro.shape[1])[None, :] < self.imu_n[:, None]
        )
        args = (
            self.map.kfs.Rcw, self.map.kfs.tcw,
            jnp.asarray(self.imu_gyro), jnp.asarray(self.imu_acc),
            jnp.asarray(self.imu_dt), smask, jnp.asarray(N, jnp.int32),
        )

        if self.estimate_extrinsics:
            if self._q_rcb_prev is None and self.random_matrix_first_vio_init:
                q0 = self._init_rng.normal(0, 1.0, 4)
                self._q_rcb_prev = jnp.asarray(
                    q0 / np.linalg.norm(q0), jnp.float32
                )
            out = self._vk.init_attempt_calib(
                *args, self.noise, float(self.gravity_mag),
                self._q_rcb_prev, self._sgp_prev, self._ref_prev,
            )
            self._q_rcb_prev = out["q"]
            self._sgp_prev = (out["s_star"], out["gw_star"], out["pcb_star"])
            self._ref_prev = (out["s"], out["dtheta"], out["ba"], out["pcb"])
            # ONE packed fetch for the host-side convergence monitors —
            # a device_get costs ~25 ms PER LEAF over the tunnel, so the
            # former 8-leaf fetch dominated the attempt cost
            f32 = jnp.float32
            mon = np.asarray(jax.device_get(jnp.concatenate([
                out["Rcb"].astype(f32).ravel(), out["pcb"].astype(f32),
                jnp.stack([out["s_star"].astype(f32), out["s"].astype(f32)]),
                out["gw_star"].astype(f32), out["gw"].astype(f32),
                out["bg"].astype(f32), out["ba"].astype(f32),
            ])), np.float64)
            Rcb_h = mon[0:9].reshape(3, 3)
            pcb_h = mon[9:12]
            s_star_h, s_h = mon[12], mon[13]
            gw_star_h, gw_h = mon[14:17], mon[17:20]
            bg_h, ba_h = mon[20:23], mon[23:26]
            Rbc = np.asarray(Rcb_h).T
            pbc = -Rbc @ np.asarray(pcb_h)
            self.mon_rbc.push(ts, vio_init.euler_zyx_deg(Rbc))
            self.mon_pbc.push(ts, pbc)
            self._dump_init("scale", ts, [float(s_star_h), float(s_h)])
            self._dump_init("gw", ts, np.r_[gw_star_h, gw_h])
            self._dump_init("biasg", ts, bg_h)
            self._dump_init("biasa", ts, ba_h)
            self._dump_init("R_bc_estimate", ts, vio_init.euler_zyx_deg(Rbc))
            self._dump_init("p_bc_refined", ts, pbc)
            self._dump_init(
                "Processing_Time", ts,
                [(_time.perf_counter() - _t_attempt) * 1e3],
            )
            ok = self.mon_rbc.converged(ts) and self.mon_pbc.converged(ts)
            if not ok:
                return False
            self.Rcb = jnp.asarray(out["Rcb"], jnp.float32)
            self.pcb = jnp.asarray(out["pcb"], jnp.float32)
            s_h = float(s_h)
        else:
            # The fixed-Tbc variant succeeds solely on the 15 s timer
            # (LocalMapping.cc:1317-1321): estimates computed before the
            # gate are discarded (the reference keeps them only for the
            # InitVIOTmpPath dump files). Skip the whole attempt for
            # pre-gate frames unless dumps were requested.
            pre_gate = ts - self._init_t0 < self.force_init_after_s
            if pre_gate and not self.vio_tmp_path:
                return False
            out = self._vk.init_attempt_fixed(
                *args, self.Rcb, self.pcb, self.noise,
                float(self.gravity_mag),
            )
            if self.vio_tmp_path:
                s_star_h, s_h, gw_star_h, gw_h, bg_h, ba_h = jax.device_get((
                    out["s_star"], out["s"], out["gw_star"], out["gw"],
                    out["bg"], out["ba"],
                ))
                self._dump_init("scale", ts, [float(s_star_h), float(s_h)])
                self._dump_init("gw", ts, np.r_[gw_star_h, gw_h])
                self._dump_init("biasg", ts, bg_h)
                self._dump_init("biasa", ts, ba_h)
                self._dump_init(
                    "Processing_Time", ts,
                    [(_time.perf_counter() - _t_attempt) * 1e3],
                )
            if pre_gate:
                return False
            s_h = float(out["s"])

        # --- success: biases + preintegration from the attempt program,
        # NavStates written and map rescaled in one jitted tail ---
        self.bg = out["bg"]
        self.ba_ = out["ba"]
        self.pre = out["pre"]
        self.map = self._vk.apply_init(
            self.map, out["ns"], jnp.asarray(N, jnp.int32), out["s"]
        )
        self.gravity = jnp.asarray(out["gw"], jnp.float32)
        self.scale = s_h
        self.vins_inited = True

        # seed the VI tracking state from the newest keyframe
        last_id = N - 1
        self.ns_kf = jax.tree.map(lambda a: a[last_id], self.map.kfs.nav)
        self.ns = self.ns_kf
        self.prior_ns = None  # no frame prior yet; first frame tracks vs KF
        self._map_updated = True
        self.last["Rcw"] = self.map.kfs.Rcw[last_id]
        self.last["tcw"] = self.map.kfs.tcw[last_id]
        return True

    # NOTE on failed attempts: the reference resets biases to zero and
    # re-preintegrates after each failure (LocalMapping.cc:1785-1800). The
    # fused attempt program never mutates the system's bias/preintegration
    # state in the first place — estimates live inside the program — so the
    # post-failure state is identical without the extra dispatch.

    # ------------------------------------------------------------------
    # VI tracking (after initialization).
    # ------------------------------------------------------------------
    def _imu_arrays(self, samples):
        """(gyro, acc, dt) zero-padded to a power-of-two bucket: keeps the
        jitted scan shape stable across frames (a fresh shape would
        recompile every frame)."""
        arr = np.asarray(samples, np.float32).reshape(-1, 7)
        M = 64
        while M < max(len(arr), 1):
            M *= 2
        g = np.zeros((M, 3), np.float32)
        a = np.zeros((M, 3), np.float32)
        d = np.zeros((M,), np.float32)
        g[: len(arr)] = arr[:, 0:3]
        a[: len(arr)] = arr[:, 3:6]
        d[: len(arr)] = arr[:, 6]
        return jnp.asarray(g), jnp.asarray(a), jnp.asarray(d)

    def _preint_since(self, samples) -> imu_ops.PreintState:
        g, a, d = self._imu_arrays(samples)
        return imu_ops.preintegrate(g, a, d, self.bg, self.ba_, self.noise)

    def _track_vi(self, frame: FrameData, ts: float) -> dict:
        """One VI-tracked frame = ONE fused XLA program
        (fused_vi_frame_step) + one small scalar fetch.

        bMapUpdated handoff (Tracking.cc:1049-1062): with a map change
        since the last frame (KF insert / loop / init / reloc), track
        against the last KEYFRAME (preintegration since KF); otherwise
        against the last FRAME with its 15-dim marginalization prior
        (Optimizer.cc:326-597 vs :600-977). The two modes are two compiled
        variants of the same fused program."""
        # flush BEFORE this frame's dispatches (see MonoSystem._track):
        # the flush's scalar-stack fetch executes in device queue order
        st_flush = None
        if self.decision_lag > 1 and (
            len(self._pending) >= max(1, self.decision_lag // 2)
        ):
            st_flush = self._flush_decisions()
            if self.state == LOST:
                return self._try_relocalize(frame, ts)

        vs_kf = self._map_updated or self.prior_ns is None or self.ns is None
        self._map_updated = False

        imu = self._imu_arrays(self._imu_buf if vs_kf else self._imu_since_frame)
        ns_base = self.ns_kf if vs_kf else self.ns
        # vs-KF variant never reads the prior args (XLA removes them); pass
        # same-shaped placeholders
        prior_ns = self.prior_ns if (not vs_kf and self.prior_ns is not None) else ns_base
        fused = self._vk.fused_vs_kf if vs_kf else self._vk.fused_vs_frame
        last = self.last
        ref_pose_kf = self._n_kfs_cache - 1
        min_obs = 2 if self._n_kfs_cache <= 2 else 3
        with self.times.stage("track_fused_vi"):
            out, self.map = fused(
                self.map, frame, imu, ns_base, last["Rcw"], last["tcw"],
                last["assoc"], last["frame"].feats.angle, self.gravity,
                self.Rcb, self.pcb, self.bg, self.ba_, self.noise,
                prior_ns, self.prior_info,
                self._dev_scalar(ref_pose_kf),
                self._dev_scalar(self._ref_kf_id()),
                self._dev_scalar(min_obs),
            )

        # chain state on-device; decisions resolve at the batched fetch
        self.ns = out.ns
        # current frame's prior for the next frame-to-frame optimization
        # (the reference stores mNavStatePrior + mMargCovInv on the frame
        # when bComputeMarg=true, Optimizer.cc:567-582)
        self.prior_ns = out.ns
        self.prior_info = out.marg
        self.last = dict(
            frame=frame, Rcw=out.Rcw, tcw=out.tcw, assoc=out.assoc, ts=ts,
        )
        self.trajectory.append((ts, out.Rcw, out.tcw))
        self.rel_trajectory.append((ts, ref_pose_kf, out.Rcr, out.tcr))
        self._pending.append(dict(
            frame=frame, ts=ts, out=out,
            traj_idx=len(self.trajectory) - 1,
            rel_idx=len(self.rel_trajectory) - 1,
            imu_mark=len(self._imu_buf),
            vs_kf=vs_kf, ns_base=ns_base,
        ))
        from .system import copy_async

        copy_async(out.scalars)
        if self.decision_lag == 1:
            st = self._flush_decisions()
            st.setdefault("vs_kf", vs_kf)
            return st
        if st_flush is not None:
            st_flush.setdefault("vs_kf", vs_kf)
            st_flush["pending"] = len(self._pending)
            return st_flush
        return {"state": self.state, "pending": len(self._pending)}

    def _insert_vi_keyframe(
        self, frame, ts, ns, inliers, track_out, update_last=True,
        imu_rows=None,
    ):
        kf_id = self._n_kfs_cache
        self._store_imu_interval(kf_id, rows=imu_rows)
        assoc_row = jnp.where(inliers, track_out.assoc, -1)
        Rcw, tcw = navstate_to_camera(ns, self.Rcb, self.pcb)
        m = self._add_kf(
            self.map, Rcw, tcw, frame.feats, frame.xy_und, ts, assoc_row,
            nav=ns, u_right=frame.u_right,
        )
        self._register_kf_host(kf_id, ts)

        # triangulate with best covisible neighbors + SearchInNeighbors fuse
        m, _ = self._triangulate_and_fuse(m, kf_id, assoc_row)
        self.map = m

        # VI local BA over the temporal window
        with self.times.stage("local_ba"):
            self._vi_local_ba(kf_id)

        # culling + loop closing (with NavState correction through Tbc,
        # LoopClosing.cc:619-625 OptimizeEssentialGraphForMonoVI) deferred
        # to the next decision flush — see MonoSystem._queue_kf_post
        self._queue_kf_post(kf_id)

        self.ns_kf = jax.tree.map(lambda a: a[kf_id], self.map.kfs.nav)
        self.ref_kf_tracked = track_out.n_inliers  # device scalar; not read
        self.frames_since_kf = 0
        if update_last:
            # the inserted frame IS the newest: re-anchor tracking on the
            # BA-refined keyframe state
            self.ns = self.ns_kf
            Rcw, tcw = navstate_to_camera(self.ns_kf, self.Rcb, self.pcb)
            self.last["Rcw"] = Rcw
            self.last["tcw"] = tcw
        self._map_updated = True  # next frame tracks vs this keyframe

    def _pending_extras(self) -> dict:
        # deferred insertion must know where this frame's IMU samples end
        # in the since-last-KF buffer (valid for both the pre-init vision
        # path and the VI path)
        return {"imu_mark": len(self._imu_buf)}

    def _loop_extra_args(self) -> dict:
        """Deferred loop correction runs the NavState-aware variant
        (OptimizeEssentialGraphForMonoVI + UpdateNavStatePVRFromTcw)."""
        return dict(Rcb=self.Rcb, pcb=self.pcb, gravity=self.gravity)

    def _on_loop_closed(self, new_id: int):
        """A deferred loop correction rewrote every keyframe pose and
        NavState: re-anchor the tracking state on the (corrected) current
        reference keyframe and force the next frame to track vs it — the
        reference's map-updated handoff after CorrectLoop
        (Tracking.cc:1049-1062)."""
        super()._on_loop_closed(new_id)
        ref = self._ref_kf_id()
        self.ns_kf = jax.tree.map(lambda a: a[ref], self.map.kfs.nav)
        self.prior_ns = None
        self._map_updated = True

    def _insert_pending(self, p: dict, is_newest: bool):
        """Deferred keyframe insertion: the IMU interval spans only the
        samples up to the inserted frame (imu_mark); later samples stay
        buffered for the next interval, so the preintegration chain between
        consecutive keyframes stays exact even when the decision lands
        lag-1 frames late."""
        out = p["out"]
        mark = p.get("imu_mark", len(self._imu_buf))
        rows, self._imu_buf = self._imu_buf[:mark], self._imu_buf[mark:]
        # entries still pending (the keep_newest frame of this flush, plus
        # any later batch) recorded their imu_mark against the buffer
        # BEFORE this insertion consumed its first `mark` rows — re-base
        # them or the next deferred keyframe slices the wrong IMU interval
        # and corrupts the preintegration chain (breaks VIO init).
        for q in self._pending:
            if "imu_mark" in q:
                q["imu_mark"] = max(0, q["imu_mark"] - mark)
        to = tracking.TrackOutput(
            Rcw=out.Rcw, tcw=out.tcw, assoc=out.assoc,
            n_inliers=out.scalars[0],
        )
        if hasattr(out, "ns"):  # VI-tracked frame
            self._insert_vi_keyframe(
                p["frame"], p["ts"], out.ns, out.assoc >= 0, to,
                update_last=is_newest, imu_rows=rows,
            )
        else:  # pre-init vision-tracked frame
            self._insert_keyframe(
                p["frame"], p["ts"], to, update_last=is_newest, imu_rows=rows,
            )

    def _attempt_vision_aid(self, p: dict, is_newest: bool) -> dict | None:
        """visionAidWhenTrackWithIMUFail hook from the decision flush.
        Only attempted when the failing frame is the newest one (the
        synchronous case; with a deferred lag the IMU buffers have moved
        past the failing frame and a clean re-track is not possible)."""
        if not (self.vins_inited and self.vision_aid_when_imu_fails and is_newest):
            return None
        if "vs_kf" not in p or "ns_base" not in p:
            # Pending entry came from a VISION-tracked frame (vision-aid /
            # recovery / pre-init path via MonoSystem._track carries only
            # imu_mark): vision tracking already failed for it, so there is
            # no IMU prediction to re-aid from — proceed to LOST, matching
            # the reference where the vision fallback itself failing falls
            # through to the LOST branch (Tracking.cc:1092-1117).
            return None
        pre_used = self._preint_since(
            self._imu_buf if p["vs_kf"] else self._imu_since_frame
        )
        ns_pred = imu_ops.propagate_navstate(
            p["ns_base"], pre_used, self.gravity
        )
        return self._vision_aid(p["frame"], p["ts"], ns_pred)

    def _vision_aid(self, frame: FrameData, ts: float, ns_pred) -> dict | None:
        """visionAidWhenTrackWithIMUFail (Tracking.cc:1092-1117,1346-1349):
        when IMU-based tracking fails, track this frame vision-only
        (motion model + local map); on success rebuild the body pose from
        the vision result, carrying over the IMU-predicted velocity and
        biases, and resume IMU tracking on the next frame."""
        self._suppress_kf = True
        try:
            st = MonoSystem._track(self, frame, ts)
        finally:
            self._suppress_kf = False
        if self.state == LOST:
            return None
        Rwb, Pwb = self._body_pose_from_cam(self.last["Rcw"], self.last["tcw"])
        self.ns = ns_pred._replace(p=Pwb, R=Rwb)
        self._map_updated = True  # no valid frame prior: resume vs KF
        st["vision_aid"] = True
        return st

    # ------------------------------------------------------------------
    # Post-relocalization recovery (VI mode):
    # Tracking.cc:1376-1407 + RecomputeIMUBiasAndCurrentNavstate (:111-279).
    # ------------------------------------------------------------------
    def _body_pose_from_cam(self, Rcw, tcw):
        """Rwb, Pwb from a camera pose through the extrinsics
        (inverse of navstate_to_camera)."""
        Rwb = jnp.swapaxes(self.Rcb.T @ Rcw, -1, -2)
        Pwb = -jnp.einsum("ji,j->i", Rcw, tcw - self.pcb)
        return Rwb, Pwb

    def _on_relocalized(self, frame, ts, out):
        if not self.vins_inited:
            return
        Rwb, Pwb = self._body_pose_from_cam(
            jnp.asarray(out.Rcw), jnp.asarray(out.tcw)
        )
        self._recovery = dict(R=[Rwb], p=[Pwb], pres=[], ts=[ts])

    def _track_recovery(self, frame: FrameData, ts: float) -> dict:
        """One vision-tracked frame of the 20-frame recovery window; when
        full, recompute biases + velocity and resume IMU tracking."""
        self._suppress_kf = True
        try:
            st = MonoSystem._track(self, frame, ts)
        finally:
            self._suppress_kf = False
        if self.state == LOST:
            self._recovery = None
            return st

        rec = self._recovery
        pre = self._preint_since(self._imu_since_frame)
        Rwb, Pwb = self._body_pose_from_cam(self.last["Rcw"], self.last["tcw"])
        rec["R"].append(Rwb)
        rec["p"].append(Pwb)
        rec["pres"].append(pre)
        rec["ts"].append(ts)

        if len(rec["R"]) < self.reloc_window:
            st["recovery"] = len(rec["R"])
            return st

        # window full: recompute gyro/accel bias + terminal velocity
        Rwb_all = jnp.stack(rec["R"])
        pwb_all = jnp.stack(rec["p"])
        pre_all = jax.tree.map(lambda *xs: jnp.stack(xs), *rec["pres"])
        bg, dba, v_last = relocalization.recompute_bias_after_reloc(
            Rwb_all, pwb_all, pre_all, self.gravity, self.noise
        )
        self.bg = jnp.asarray(bg, jnp.float32)
        self.ba_ = jnp.asarray(dba, jnp.float32)
        self._repreintegrate()

        z3 = jnp.zeros(3, jnp.float32)
        ns = imu_ops.NavState(
            p=pwb_all[-1].astype(jnp.float32),
            v=jnp.asarray(v_last, jnp.float32),
            R=Rwb_all[-1].astype(jnp.float32),
            bg=self.bg, ba=self.ba_, dbg=z3, dba=z3,
        )
        # re-anchor the IMU chain: the recovery end becomes a keyframe whose
        # stored interval spans everything since the pre-loss keyframe
        assoc = self.last["assoc"]
        inl = assoc >= 0
        to = tracking.TrackOutput(
            Rcw=self.last["Rcw"], tcw=self.last["tcw"], assoc=assoc,
            n_inliers=jnp.asarray(int(jnp.sum(inl)), jnp.int32),
        )
        if self._check_kf_capacity():
            self._insert_vi_keyframe(frame, ts, ns, inl, to)
        else:
            self.ns_kf = ns
            self._imu_buf = []
        self.ns = ns
        self.prior_ns = None
        self._map_updated = True
        self._recovery = None
        st["recovery_done"] = True
        return st

    def _on_compacted(self, live: np.ndarray, old2new: np.ndarray):
        """Regather the per-keyframe-slot IMU interval tables after slot
        compaction and re-preintegrate (the merged-interval chain between
        consecutive LIVE keyframes is already consistent — culling merged
        intervals forward — so a pure gather preserves it)."""
        n_new = len(live)
        for arr in (self.imu_gyro, self.imu_acc):
            arr[:n_new] = arr[live]
            arr[n_new:] = 0
        self.imu_dt[:n_new] = self.imu_dt[live]
        self.imu_dt[n_new:] = 0
        self.imu_n[:n_new] = self.imu_n[live]
        self.imu_n[n_new:] = 0
        self._repreintegrate()

    def _may_cull(self, m, k: int) -> bool:
        """VI keyframe-culling gate (KeyFrameCullingForMonoVI time-gap
        rules, LocalMapping.cc:1477-1584): removal must not create a
        preintegration interval between the culled keyframe's temporal
        neighbors longer than the reference's gaps — 0.5 s before VINS
        init / 3 s after for older keyframes, and 0.1 s / 0.5 s inside
        the local window (LocalMapping.cc:1510-1525; culling merges the
        IMU interval into the next keyframe, _on_kf_culled, so the
        preintegration chain the init least-squares consumes stays
        consistent). Round-4 note: an earlier blanket pre-init cull ban
        exhausted the keyframe table on long pre-init stretches — the
        reference culls MORE aggressively before init, not less."""
        n = self._n_kfs_cache
        valid = self._kf_valid_cache
        ts = self._kf_ts_cache
        prevs = [i for i in range(k) if valid[i]]
        nexts = [i for i in range(k + 1, n) if valid[i]]
        if not prevs or not nexts:
            return False
        live = [i for i in range(n) if valid[i]]
        w = min(len(live), self.local_window + 1)
        in_window = k >= live[-w]
        if self.vins_inited:
            timegap = 0.5 if in_window else 3.0
        else:
            # before init the init least-squares wants keyframe DENSITY
            # (every pair is an equation); the reference can afford its
            # aggressive pre-init gaps because its keyframe store is
            # unbounded, ours is a fixed table — so pre-init culling only
            # activates under table pressure (> 70% of capacity), where
            # the alternative is insertion stopping entirely.
            if len(live) <= 0.7 * self.cap.max_kfs:
                return False
            timegap = 0.1 if in_window else 0.5
        return float(ts[nexts[0]] - ts[prevs[-1]]) <= timegap

    def _on_kf_culled(self, k: int):
        """Merge the culled keyframe's IMU interval into the next valid
        keyframe and re-preintegrate (the array form of
        KeyFrame::SetBadFlag's chain re-link, KeyFrame.cc:1070-1110)."""
        n = self._n_kfs_cache
        valid = self._kf_valid_cache
        nexts = [i for i in range(k + 1, n) if valid[i]]
        if not nexts:
            return
        j = nexts[0]
        nk, nj = int(self.imu_n[k]), int(self.imu_n[j])
        M = self.imu_gyro.shape[1]
        g = np.concatenate([self.imu_gyro[k, :nk], self.imu_gyro[j, :nj]])[:M]
        a = np.concatenate([self.imu_acc[k, :nk], self.imu_acc[j, :nj]])[:M]
        d = np.concatenate([self.imu_dt[k, :nk], self.imu_dt[j, :nj]])[:M]
        nn = len(d)
        for arr, merged in ((self.imu_gyro, g), (self.imu_acc, a),
                            (self.imu_dt, d)):
            arr[j, :nn] = merged
            arr[j, nn:] = 0
        self.imu_n[j] = nn
        self.imu_n[k] = 0
        self._repreintegrate()

    def _vi_local_ba(self, kf_id: int):
        """LocalBundleAdjustmentNavState over the last `local_window` valid
        KFs (+ the one before, fixed). Culled keyframes are skipped — their
        preintegration intervals were merged into the next survivor, so the
        IMU chain between consecutive VALID keyframes stays consistent.
        The whole stage (gather + window BA + writeback) is ONE fixed-shape
        jitted program; the window is padded with -1 so every window size
        shares one compiled executable."""
        n_kfs = kf_id + 1
        valid = self._kf_valid_cache[:n_kfs]
        live = [i for i in range(n_kfs) if valid[i]]
        W = self.local_window + 1
        ids = live[-W:]
        fixed = [True] + [False] * (len(ids) - 1)
        pad = W - len(ids)
        ids = ids + [-1] * pad
        fixed = fixed + [True] * pad
        self.map, self._last_ba_active = self._vk.vi_local_ba(
            self.map, jnp.asarray(ids, jnp.int32), jnp.asarray(fixed),
            self.pre, self.Rcb, self.pcb, self.gravity, self.noise,
        )
