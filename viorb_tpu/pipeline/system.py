"""System facade: the monocular SLAM state machine over the array map.

Replaces the reference `System` + the `Tracking`/`LocalMapping` thread
interplay (`/root/reference/src/System.cc`, `src/Tracking.cc:978-1553`,
`src/LocalMapping.cc:1827-1997`) with a deterministic synchronous pipeline:

  host state machine (this file)
    -> jitted tracking kernels      (pipeline/tracking.py)
    -> jitted mapping kernels       (pipeline/local_mapping.py)
    -> jitted solver                (solver/*)

The reference's cross-thread flags (bMapUpdated, AcceptKeyFrames, abortBA)
do not exist: every stage sees the single current map state. Only a handful
of scalars (inlier counts, state decisions) cross device->host per frame.

Vision-only monocular mode here; the VI mode builds on this in
pipeline/vi_system.py.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable

logger = logging.getLogger("viorb_tpu")

import jax
import jax.numpy as jnp
import numpy as np

from ..map import arrays as ma
from ..ops import bow, matching, orb, undistort
from ..solver import ba
from ..solver.ba import Camera
from ..utils import lie
from ..utils.timing import StageTimes
from . import (
    initializer,
    kernels,
    local_mapping,
    loop_closing,
    relocalization,
    tracking,
)
from .tracking import FrameData

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


@jax.jit
def _pack_post(red, n_lms, ba_act):
    """Pack the post-insertion scalars into ONE device vector: each
    device_get leaf costs a ~25 ms tunnel round trip (see
    _flush_decisions), so the drain fetches a single array."""
    return jnp.concatenate([
        red.astype(jnp.int32),
        jnp.stack([n_lms.astype(jnp.int32), ba_act.astype(jnp.int32)]),
    ])


def copy_async(tree):
    """Start device->host copies for every array in the tree WITHOUT
    blocking — a later jax.device_get then finds the bytes already on the
    host. On the remote-tunnel TPU a cold blocking fetch costs ~27 ms of
    round-trip latency on top of waiting for the queued compute; prefetching
    overlaps both with subsequent host dispatch. No-op where the runtime
    lacks the API (older CPU backends)."""
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass


class MonoSystem:
    """Monocular vision-only SLAM (reference: TrackMonocular path)."""

    def __init__(
        self,
        cam: Camera,
        width: int,
        height: int,
        cap: ma.Capacities = ma.Capacities(),
        orb_params: orb.OrbParams | None = None,
        local_window: int = 6,
        fixed_window: int = 10,
        seed: int = 0,
        enable_loop_closing: bool = True,
        vocabulary_path: str | None = None,
        only_track_local_map: bool = False,
        dist: undistort.DistCoeffs | None = None,
        decision_lag: int = 1,
        max_kf_interval: int = 30,
        max_interval_inserts: bool = True,
        min_kf_gap_s: float = 0.0,
    ):
        self.cam = cam
        self.width = width
        self.height = height
        self.cap = cap
        self.orb_params = orb_params or orb.OrbParams(
            n_features=cap.n_feat, height=height, width=width
        )
        # keypoint undistortion (Frame::UndistortKeyPoints, Frame.cc:748):
        # geometry downstream always uses undistorted coords; the image
        # bounds for frustum gating are the undistorted corner bounds
        # (Frame::ComputeImageBounds, Frame.cc:793-826)
        self.dist = dist or undistort.DistCoeffs()
        self.bounds = undistort.undistorted_bounds(
            width, height, cam.fx, cam.fy, cam.cx, cam.cy, self.dist
        )
        self.local_window = local_window
        self.fixed_window = fixed_window
        # extra FREE slots in the mono local-BA window for strongly-
        # covisible OLDER keyframes (revisit-drift healing; see
        # kernels.ba_window)
        self.covis_free_extra = 3
        self.key = jax.random.PRNGKey(seed)

        self.state = NOT_INITIALIZED
        self.map = ma.empty_map(cap)
        self.init_frame: FrameData | None = None
        self.init_ts = 0.0
        self._init_job: dict | None = None  # deferred two-view attempt
        self.last: dict | None = None  # frame, Rcw, tcw, assoc, ts
        self.vel = (jnp.eye(3), jnp.zeros(3))
        self.ref_kf_tracked = 0
        self.frames_since_kf = 0
        self.frames_since_reloc = 1 << 30
        self.kf_overflows = 0
        self._lm_overflow_logged = False
        # local-BA landmark compaction cap + overflow surfacing (round-4
        # ADVICE low #5): the window BA drops landmarks beyond this count
        # from a round; the true active count comes back from the program
        # and is checked (prefetched, no extra sync) at the post-insertion
        # drain. The VI window derives its cap structurally (W x n_feat).
        self._ba_max_active = min(4096, cap.max_lms)
        self._last_ba_active = None
        self._ba_overflow_logged = False
        # host mirrors of device scalars (keyframe count/validity, landmark
        # count): per-frame control flow reads these instead of syncing the
        # device — on the remote-tunnel TPU each sync is a round trip and
        # the per-frame sync count, not compute, bounds e2e fps
        self._n_kfs_cache = 0
        self._n_lms_cache = 0
        self._kf_valid_cache = np.zeros(cap.max_kfs, bool)
        # per-stage timers, the reference's taxonomy (Timer instances around
        # every pipeline stage: Tracking.cc:59,82,100;
        # LocalMapping.cc:1844-1959; surfaced via System::GetTimeOf*)
        self.times = StageTimes()
        # loop closing (reference: LoopClosing thread; active unless the
        # deactiveLoopClosure config is set, configparam.cc:96-99)
        self.vocabulary_path = vocabulary_path
        # onlyTrackLocalMap (configparam.cc): skip the frame-to-frame
        # motion-model pass; seed local-map tracking from the velocity model
        self.only_track_local_map = only_track_local_map
        self.loop_closer = (
            loop_closing.LoopCloser(
                cam=cam, max_kfs=cap.max_kfs, vocabulary_path=vocabulary_path,
                bounds=tuple(self.bounds), orb_scale=self.orb_params.scale,
            )
            if enable_loop_closing
            else None
        )
        # a keyframe BoW index always exists for relocalization; when loop
        # closing is active the closer's index is shared
        self._own_index = (
            None
            if enable_loop_closing
            else bow.make_index(cap.max_kfs, vocabulary_path=vocabulary_path)
        )
        self.n_loops_closed = 0
        self.n_relocalizations = 0
        self.n_kf_insertions = 0  # total over the run (slots are recycled)
        self.n_compactions = 0
        self._suppress_kf = False  # set during VI post-reloc recovery
        # localization-only mode (System::ActivateLocalizationMode /
        # Tracking::mbOnlyTracking, /root/reference/include/System.h:151,
        # src/Tracking.cc:1017-1118): tracking localizes against the frozen
        # map — no keyframe insertion, no mapping, no loop closing. vo_mode
        # is the mbVO sub-state: map matches collapsed but frame-to-frame
        # odometry still holds (Tracking.cc:1246-1350).
        self.only_tracking = False
        self.vo_mode = False
        # deferred-decision pipelining: per-frame scalar results are fetched
        # in ONE batched transfer every `decision_lag` frames instead of one
        # blocking fetch per frame. On the remote-tunnel TPU a device->host
        # fetch costs ~30-40 ms regardless of size, so per-frame fetches —
        # not compute — bound e2e fps; with lag N the cost amortizes N-fold.
        # LOST detection and keyframe insertion then run up to N-1 frames
        # late — the same latency the reference's asynchronous LocalMapping
        # thread exhibits (tracking runs ahead; the map catches up,
        # src/LocalMapping.cc:1827). lag=1 keeps fully synchronous
        # semantics (the default; tests rely on per-frame status).
        self.decision_lag = max(1, int(decision_lag))
        # mMaxFrames: force a keyframe after this many frames without one
        # (the reference sets it to the camera fps, Tracking.cc:757).
        # max_interval_inserts=False restores the reference's exact
        # (c1a||c1b||c1c)&&c2 gate (no fixed-cadence insertions)
        self.max_kf_interval = int(max_kf_interval)
        self.max_interval_inserts = bool(max_interval_inserts)
        # Minimum time between keyframe insertions. In the reference the
        # monocular path refuses to insert while the LocalMapping thread is
        # busy (c1b's bLocalMappingIdle + the explicit monocular refusal,
        # Tracking.cc:2129,2185-2205) — a ~100-300 ms implicit cadence
        # limiter. The synchronous pipeline is always "idle", so without
        # this gate c2 can insert at frame rate, flooding the fixed table
        # and (VI mode) starving the init least-squares of baseline: at
        # 20 Hz insertion the preintegration intervals are 0.05 s and the
        # scale/gravity/pcb systems (dt^2-weighted) are noise-dominated.
        self.min_kf_gap_s = float(min_kf_gap_s)
        self._pending: list = []
        # deferred keyframe post-processing (redundancy culling + loop
        # detection): dispatched + async-copied at insertion, resolved at
        # the NEXT decision flush so the device->host latency and the
        # mapping/BA device compute overlap with subsequent frame tracking
        # (the reference's LocalMapping/LoopClosing threads run behind
        # Tracking the same way). With decision_lag == 1 the job drains
        # immediately — fully synchronous semantics for tests.
        self._kf_post: dict | None = None
        self.trajectory: list = []  # (ts, Rcw, tcw) per tracked frame (raw)
        # per-frame (ts, ref_kf, R_cr, t_cr): pose relative to the reference
        # keyframe at track time; frame_trajectory() composes these with the
        # *optimized* keyframe poses (Tracking.cc:1525-1541 + SaveTrajectory)
        self.rel_trajectory: list = []

        # --- jitted kernels, shared across instances with identical static
        # config (pipeline/kernels.py): a second system no longer recompiles
        # every stage, so warm-up transfers between instances and the timed
        # bench pass measures work, not XLA (round-2 ADVICE medium finding).
        # The init extractor puts the whole budget on level 0 — the
        # reference doubles the budget while NOT_INITIALIZED instead
        # (mpIniORBextractor, Tracking.cc:842,1620); SearchForInitialization
        # only matches level-0 keypoints, so this multiplies usable init
        # matches ~4x without reshaping tables.
        stereo = bool(cam.bf > 0)
        k = kernels.mono_kernels(
            cam, self.orb_params, self.dist, tuple(self.bounds),
            only_track_local_map, stereo,
        )
        self._k = k
        self._extract = k.extract
        self._extract_ini = k.extract_ini
        self._undistort = k.undistort
        self._match_init = k.match_init
        self._initialize = k.initialize
        self._fused = k.fused
        self._track_mm = k.track_mm
        self._track_ref_kf = k.track_ref_kf
        self._ref_tracked = k.ref_tracked
        self._track_lm = k.track_lm
        self._track_lm_wide = k.track_lm_wide
        self._triangulate = k.triangulate
        self._local_ba = k.local_ba
        self._cull = k.cull
        self._covis = k.covis
        self._add_kf = k.add_kf
        self._fuse = k.fuse
        self._dedup = k.dedup
        self._distinct = k.distinct
        self._lm_mask_of = k.lm_mask_of
        # host mirror of keyframe timestamps (cull-time gates read these
        # instead of syncing the device table)
        self._kf_ts_cache = np.zeros(cap.max_kfs, np.float64)
        # device-scalar cache: jnp.asarray(int) is a ~0.6-1 ms host-blocking
        # h2d transfer AND interleaves a transfer into the device stream
        # between compute launches; the per-frame scalars (reference kf ids,
        # min_obs) repeat across frames, so reuse the device buffers
        self._dev_i32: dict = {}

    def _dev_scalar(self, v: int):
        a = self._dev_i32.get(v)
        if a is None:
            if len(self._dev_i32) > 4096:
                self._dev_i32.clear()
            a = jnp.asarray(v, jnp.int32)
            self._dev_i32[v] = a
        return a

    # ------------------------------------------------------------------
    def make_frame(self, image) -> FrameData:
        """Extract ORB features and undistort the keypoints
        (Frame ctor: ORB extract + UndistortKeyPoints, Frame.cc:44-111,748).
        While NOT_INITIALIZED the boosted init extractor runs instead
        (Tracking::GrabImageMonocular's mpIniORBextractor switch)."""
        ex = self._extract_ini if self.state == NOT_INITIALIZED else self._extract
        feats = ex(image)
        xy_und = feats.xy if self.dist.is_zero else self._undistort(feats.xy)
        return FrameData(feats=feats, xy_und=xy_und)

    @property
    def kf_index(self) -> bow.DescriptorIndex:
        return self.loop_closer.index if self.loop_closer else self._own_index

    def track_features(self, frame: FrameData, timestamp: float) -> dict:
        """Feed one frame's features; returns a status dict."""
        if self.state == NOT_INITIALIZED:
            return self._try_initialize(frame, timestamp)
        if self.state == LOST:
            return self._try_relocalize(frame, timestamp)
        return self._track(frame, timestamp)

    # ------------------------------------------------------------------
    def _try_relocalize(self, frame: FrameData, ts: float) -> dict:
        """Tracking-LOST recovery (Tracking.cc:1152-1168): BoW candidates +
        EPnP RANSAC + pose optimization. The reference resets the whole
        system if lost with <= 5 keyframes (Tracking.cc:1499-1507)."""
        if self._n_kfs_cache <= 5 and not self.only_tracking:
            self.reset()
            return {"state": self.state, "reset": True}
        self.key, sub = self._k.split(self.key)
        out = relocalization.relocalize(
            self.map, frame, self.cam, self.kf_index, sub
        )
        if out is None:
            return {"state": self.state, "reloc": False}
        self.state = OK
        self.n_relocalizations += 1
        self.last = dict(
            frame=frame, Rcw=jnp.asarray(out.Rcw), tcw=jnp.asarray(out.tcw),
            assoc=jnp.asarray(out.assoc), ts=ts,
        )
        self.vel = (jnp.eye(3), jnp.zeros(3))  # motion model cleared
        self.frames_since_kf = 0
        self.frames_since_reloc = 0  # gates KF insertion (Tracking.cc:2113)
        self.trajectory.append((ts, out.Rcw, out.tcw))
        self._on_relocalized(frame, ts, out)
        return {"state": self.state, "reloc": True, "n_inliers": out.n_inliers}

    def _on_relocalized(self, frame, ts, out):
        """Hook for subclasses (VI bias recomputation)."""

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Freeze the map and only localize (System::ActivateLocalizationMode,
        /root/reference/include/System.h:151; the reference pauses the
        LocalMapping thread and sets Tracking::mbOnlyTracking,
        src/System.cc + src/Tracking.cc:1017). Pending decisions are
        resolved first so no deferred keyframe lands after the switch."""
        self._flush_decisions()
        self.only_tracking = True
        self.vo_mode = False

    def deactivate_localization_mode(self):
        """Resume mapping (System::DeactivateLocalizationMode)."""
        self._flush_decisions()
        self.only_tracking = False
        self.vo_mode = False

    def reset(self):
        """Full system reset cascade (Tracking::Reset, Tracking.cc:2729-2783)."""
        self.state = NOT_INITIALIZED
        self.map = ma.empty_map(self.cap)
        self.init_frame = None
        self._init_job = None
        self.last = None
        self.vel = (jnp.eye(3), jnp.zeros(3))
        self.ref_kf_tracked = 0
        self.frames_since_kf = 0
        self.frames_since_reloc = 1 << 30
        self.kf_overflows = 0
        self.vo_mode = False
        self._lm_overflow_logged = False
        self._last_ba_active = None
        self._n_kfs_cache = 0
        self._n_lms_cache = 0
        self._kf_valid_cache = np.zeros(self.cap.max_kfs, bool)
        self._kf_ts_cache = np.zeros(self.cap.max_kfs, np.float64)
        self._pending = []
        self._kf_post = None
        self.n_kf_insertions = 0
        self.n_compactions = 0
        self.trajectory = []
        self.rel_trajectory = []
        if self.loop_closer is not None:
            self.loop_closer = loop_closing.LoopCloser(
                cam=self.cam, max_kfs=self.cap.max_kfs,
                vocabulary_path=self.vocabulary_path,
                bounds=tuple(self.bounds), orb_scale=self.orb_params.scale,
            )
        else:
            self._own_index = bow.make_index(
                self.cap.max_kfs, vocabulary_path=self.vocabulary_path
            )

    def track_image(self, image, timestamp: float) -> dict:
        return self.track_features(self.make_frame(image), timestamp)

    # ------------------------------------------------------------------
    def _resolve_pending_init(self) -> bool:
        """Resolve the PREVIOUS frame's deferred two-view init attempt.
        Returns True when the initial map was created (state -> OK)."""
        job, self._init_job = self._init_job, None
        if job is None:
            return False
        n_feat, n_matches, success = (
            int(x) for x in np.asarray(jax.device_get(job["scal"]))
        )
        if n_matches < 100:
            # candidate moves to the attempt's (newer) frame
            self.init_frame = job["frame"] if n_feat > 100 else None
            self.init_ts = job["ts"]
            return False
        if not success:
            return False
        self._create_initial_map(job["frame"], job["ts"], job["res"], job["init"])
        return True

    def _try_initialize(self, frame: FrameData, ts: float) -> dict:
        """Two-view monocular bootstrap, ONE fused program per frame with
        its decision DEFERRED to the next frame (MonocularInitialization,
        Tracking.cc:1616-1717). The attempt program costs ~66 ms of device
        time; fetching its verdict in the same frame serialized host and
        device for ~126 ms per bootstrap frame (round-5 profiling) — the
        one-frame lag pipelines it, exactly like the tracked-frame
        decision flush."""
        if self._resolve_pending_init():
            # map created from the previous frame: track this one normally
            return self._track(frame, ts)
        if self.state != NOT_INITIALIZED:
            return {"state": self.state}
        if self.init_frame is None:
            if int(self._k.feat_count(frame)) > 100:
                self.init_frame = frame
                self.init_ts = ts
            return {"state": self.state}
        # NOTE: a round-5 experiment attempting only on alternate frames
        # (halving the ~66 ms/frame attempt cost) was reverted: with half
        # the attempts, the inter-frame match decay outruns the parallax
        # accumulation on slow orbits — the candidate keeps resetting and
        # bootstrap TRIPLES (42 of 48 frames on test_image_e2e's fixture).
        # Per-frame attempts, decision deferred one frame, is the balance.
        self.key, sub = self._k.split(self.key)
        res, init, scal = self._k.init_attempt(self.init_frame, frame, sub)
        copy_async(scal)
        self._init_job = dict(frame=frame, ts=ts, res=res, init=init, scal=scal)
        return {"state": self.state, "init_pending": True}

    def _create_initial_map(self, frame: FrameData, ts, match_res, init):
        """CreateInitialMapMonocular (Tracking.cc:1726): two keyframes, the
        triangulated landmarks, a global BA, and median-depth normalization."""
        good = match_res.valid & init.good
        X = init.points
        # median-depth normalization (Tracking.cc:1805-1830)
        z = X[:, 2]
        med = jnp.nanmedian(jnp.where(good, z, jnp.nan))
        med = jnp.nan_to_num(med, nan=1.0)
        scale = 1.0 / jnp.maximum(med, 1e-6)
        X = X * scale
        tcw2 = init.tcw2 * scale

        m = self.map
        N = self.cap.n_feat
        assoc_empty = jnp.full((N,), -1, jnp.int32)
        m = self._add_kf(
            m, jnp.eye(3), jnp.zeros(3), self.init_frame.feats,
            self.init_frame.xy_und, self.init_ts, assoc_empty,
            u_right=self.init_frame.u_right,
        )
        m = self._add_kf(
            m, init.Rcw2, tcw2, frame.feats, frame.xy_und, ts, assoc_empty,
            u_right=frame.u_right,
        )
        # scale-invariance range from the first-view distance and octave
        # (MapPoint ctor semantics: dmax = d * s^level, dmin = dmax/s^(nl-1))
        s = self.orb_params.scale
        d1 = jnp.linalg.norm(X, axis=-1)
        level = self.init_frame.feats.octave.astype(X.dtype)
        dist_max = d1 * (s**level)
        dist_min = dist_max / (s ** (self.orb_params.n_levels - 1))
        m = ma.add_landmarks(
            m,
            pos=X,
            pm1=self.init_frame.feats.desc_pm1,
            normal=-jnp.broadcast_to((jnp.zeros(3)).astype(X.dtype), X.shape),
            dist_min=dist_min,
            dist_max=dist_max,
            kf_a=jnp.asarray(0),
            kf_b=jnp.asarray(1),
            feat_a=jnp.arange(N),
            feat_b=jnp.clip(match_res.idx, 0),
            ok=good,
        )
        m = ma.update_landmark_geometry(m, jnp.arange(self.cap.max_lms))

        # global BA on the 2 keyframes (20 iters; first fixed)
        ids = jnp.asarray([0, 1], jnp.int32)
        fixed = jnp.asarray([True, False])
        obs = local_mapping.gather_ba_problem(m, ids, self.cam)
        state = ba.VisionBAState(Rcw=m.kfs.Rcw[:2], tcw=m.kfs.tcw[:2], points=m.lms.pos)
        out, obs2 = self._k.init_ba(state, obs, fixed)
        kfs = m.kfs._replace(
            Rcw=m.kfs.Rcw.at[:2].set(out.Rcw), tcw=m.kfs.tcw.at[:2].set(out.tcw)
        )
        m = m._replace(kfs=kfs, lms=m.lms._replace(pos=out.points))

        self.map = m
        self._register_kf_host(0, self.init_ts)
        self._register_kf_host(1, ts)
        self._n_lms_cache = int(m.lms.valid.sum())
        for k in (0, 1):
            self.kf_index.add(k, m.kfs.feat_pm1[k], m.kfs.feat_valid[k])
        assoc_row = np.asarray(m.assoc[1])
        self.last = dict(
            frame=frame, Rcw=m.kfs.Rcw[1], tcw=m.kfs.tcw[1],
            assoc=m.assoc[1], ts=ts,
        )
        self.vel = (jnp.eye(3), jnp.zeros(3))
        self.ref_kf_tracked = int((assoc_row >= 0).sum())
        self.frames_since_kf = 0
        self.state = OK
        self.trajectory.append((ts, np.asarray(m.kfs.Rcw[1]), np.asarray(m.kfs.tcw[1])))
        self.rel_trajectory.append((self.init_ts, 0, np.eye(3), np.zeros(3)))
        self.rel_trajectory.append((ts, 1, np.eye(3), np.zeros(3)))

    # ------------------------------------------------------------------
    def frame_trajectory(self):
        """(ts, Rcw, tcw) per tracked frame, composed from the *current*
        (optimized) keyframe poses via the stored relative transforms —
        the reference's SaveTrajectoryTUM semantics (System.cc). The stored
        relatives may be device arrays (tracking never syncs them);
        converted here in one pass."""
        self._flush_decisions()
        Rk = np.asarray(self.map.kfs.Rcw)
        tk = np.asarray(self.map.kfs.tcw)
        out = []
        for ts, ref, Rcr, tcr in self.rel_trajectory:
            Rcr = np.asarray(Rcr)
            tcr = np.asarray(tcr)
            R = Rcr @ Rk[ref]
            t = Rcr @ tk[ref] + tcr
            out.append((ts, R, t))
        return out

    # ------------------------------------------------------------------
    def _track(self, frame: FrameData, ts: float) -> dict:
        """One tracked frame = ONE fused XLA program (motion-model pass,
        TrackReferenceKeyFrame fallback rung, local-map pass, velocity
        update, relative-pose bookkeeping — tracking.fused_frame_step) plus
        ONE small scalar fetch for the host decisions. The reference runs
        the same per-frame sequence at Tracking.cc:978-1553; here the host
        never touches intermediate results, so per-frame cost is device
        compute, not dispatch round-trips (round-2 VERDICT item 1)."""
        # flush BEFORE this frame's dispatches (lag > 1): the flush fetch
        # is itself a device op (the scalar stack) executing in queue
        # order, so flushing after the dispatch would make it wait on THIS
        # frame's extract+track too — one extra frame of device time per
        # flush for nothing. With lag == 1 the flush stays at the end of
        # the frame (fully synchronous per-frame semantics for tests).
        # flush cadence = lag/2 (staleness never exceeds half the nominal
        # lag): with the packed single-round-trip fetch there is no longer
        # a reason to batch decisions maximally — fresher decisions mean
        # keyframes land closer to the reference cadence (measured: lag-4
        # flush-every-4 lost ~25% of keyframes and doubled ATE)
        st_flush = None
        if self.decision_lag > 1 and not self._suppress_kf and (
            len(self._pending) >= max(1, self.decision_lag // 2)
        ):
            st_flush = self._flush_decisions()
            if self.state == LOST:
                # a pending frame was declared lost: this frame goes to
                # relocalization, not tracking
                return self._try_relocalize(frame, ts)
        last = self.last
        ref_pose_kf = self._n_kfs_cache - 1  # trajectory anchor (newest slot)
        min_obs = 2 if self._n_kfs_cache <= 2 else 3
        with self.times.stage("track_fused"):
            out, self.map = self._fused(
                self.map, frame, last["Rcw"], last["tcw"], last["assoc"],
                last["frame"].feats.angle, self.vel[0], self.vel[1],
                self._dev_scalar(ref_pose_kf),
                self._dev_scalar(self._ref_kf_id()),
                self._dev_scalar(min_obs),
            )

        # chain state on-device; decisions resolve at the next batched fetch
        self.vel = (out.vel_R, out.vel_t)
        self.last = dict(frame=frame, Rcw=out.Rcw, tcw=out.tcw, assoc=out.assoc, ts=ts)
        self.trajectory.append((ts, out.Rcw, out.tcw))
        self.rel_trajectory.append((ts, ref_pose_kf, out.Rcr, out.tcr))
        self._pending.append(dict(
            frame=frame, ts=ts, out=out,
            traj_idx=len(self.trajectory) - 1,
            rel_idx=len(self.rel_trajectory) - 1,
            **self._pending_extras(),
        ))
        copy_async(out.scalars)
        # recovery / vision-aid callers (_suppress_kf) and lag == 1 need
        # the resolved state for THIS frame immediately
        if self._suppress_kf or self.decision_lag == 1:
            return self._flush_decisions()
        if st_flush is not None:
            st_flush["pending"] = len(self._pending)
            return st_flush
        return {"state": self.state, "pending": len(self._pending)}

    def _flush_decisions(self, keep_newest: bool = False) -> dict:
        """Resolve LOST / NeedNewKeyFrame for every pending frame, plus the
        deferred keyframe post-processing job and any deferred Sim3
        verifications, with ONE packed device->host transfer.

        Tunnel economics (round-5 probes): a device_get costs a full ~25 ms
        round trip PER CALL — async copies never land while the host
        pipeline is busy, and any fetch also drains the in-order device
        queue first. The flush therefore concatenates EVERYTHING it needs
        (pend scalar vectors, the post-insertion packed vector, the loop
        detect vector, pending Sim3 verdict vectors) into one f32 array on
        device and fetches once; the slices are handed to the drain/resolve
        stages as numpy (jax.device_get on numpy is a no-op)."""
        if not self._pending or (keep_newest and len(self._pending) <= 1):
            self._drain_kf_post()
            return {"state": self.state}
        if keep_newest:
            pend, self._pending = self._pending[:-1], self._pending[-1:]
        else:
            pend, self._pending = self._pending, []

        job = self._kf_post
        sim3_jobs = self.loop_closer.pending_sim3 if self.loop_closer else []
        pieces = [
            jnp.stack([p["out"].scalars for p in pend])
            .astype(jnp.float32).ravel()
        ]
        sizes = [4 * len(pend)]
        if job is not None:
            pieces.append(job["packed"].astype(jnp.float32))
            sizes.append(job["packed"].shape[0])
            dev = (job.get("loop") or {}).get("dev")
            if dev is not None:
                pieces.append(dev)
                sizes.append(dev.shape[0])
        for sj in sim3_jobs:
            pieces.append(sj["dev"])
            sizes.append(sj["dev"].shape[0])
        with self.times.stage("decision_fetch"):
            arr = np.asarray(jax.device_get(jnp.concatenate(pieces)))
        off = sizes[0]
        scal = arr[:off].reshape(len(pend), 4)
        if job is not None:
            job["packed"] = arr[off : off + sizes[1]]
            off += sizes[1]
            if (job.get("loop") or {}).get("dev") is not None:
                job["loop"]["dev"] = arr[off : off + job["loop"]["dev"].shape[0]]
                off += job["loop"]["dev"].shape[0]
        for sj in sim3_jobs:
            n = sj["dev"].shape[0]
            sj["dev"] = arr[off : off + n]
            off += n

        # post-insertion drain AFTER the single fetch (it consumes the
        # numpy slices; any work it dispatches queues behind the fetch)
        loops_before = self.n_loops_closed
        self._drain_kf_post()
        st = {"state": self.state}
        # Pass 1: LOST / visual-odometry sub-state checks per entry, in
        # frame order. Pass 2 (after the loop): at most ONE keyframe per
        # flush, and the frame INSERTED is the NEWEST pending one — the
        # triggering entry's scalars may be lag-1 frames stale, but
        # inserting that stale frame plants a keyframe whose pose and
        # associations predate several tracked frames (measured: KF-pose
        # ATE 3x worse); the reference always keyframes the CURRENT frame
        # (Tracking::CreateNewKeyFrame on mCurrentFrame, Tracking.cc:2211).
        need_insert = False
        for p, s in zip(pend, scal):
            n_inl, n_mm, used_ref_kf, n_ref = (int(x) for x in s)
            if n_inl < 10:
                if self.only_tracking and n_mm >= 20:
                    # mbVO sub-mode (Tracking.cc:1246-1350): map matches
                    # collapsed but frame-to-frame odometry still holds —
                    # keep the odometric pose and attempt relocalization
                    # (newest pending frame; the reference tries per frame)
                    self.vo_mode = True
                    if p is pend[-1]:
                        self._vo_relocalize(p)
                    st = {"state": self.state, "n_inliers": n_inl,
                          "n_mm": n_mm, "vo": self.vo_mode}
                    continue
                # frames tracked after the loss (lag > 1) carried garbage
                # poses: drop them from the trajectory (including any
                # still-pending newer frame) and go LOST now
                del self.trajectory[p["traj_idx"]:]
                del self.rel_trajectory[p["rel_idx"]:]
                self._pending = []
                st_aid = self._attempt_vision_aid(
                    p, is_newest=not keep_newest and p is pend[-1]
                )
                if st_aid is not None:
                    return st_aid
                self.state = LOST
                return {"state": self.state, "n_inliers": n_inl, "n_mm": n_mm}
            elif self.vo_mode:
                self.vo_mode = False  # map tracking resumed

            self.frames_since_kf += 1
            self.frames_since_reloc += 1
            if (
                not self.only_tracking
                and not self._suppress_kf
                and not p.get("stale_ref")
                # cadence floor, BYPASSED when tracking is decaying (< 60%
                # of the reference keyframe's landmarks — well under the
                # 0.9 insertion ratio): starving insertion loses tracking
                # outright, which the reference's busy-mapper throttle
                # never does for long (observed: inliers 100 -> 8 within
                # 15 frames on a 0.5 s floor with a 0.35 bypass)
                and (self._kf_gap_ok(p["ts"]) or n_inl < 0.6 * max(n_ref, 1))
                and tracking.need_new_keyframe(
                    n_inl, n_ref, self.frames_since_kf,
                    n_kfs=self._n_kfs_cache,
                    frames_since_reloc=self.frames_since_reloc,
                    max_frames=self.max_kf_interval,
                    monocular=self.MONOCULAR,
                    need_close_insert=self._need_close_insert(
                        p["frame"], p["out"].assoc
                    ),
                    max_interval_inserts=self.max_interval_inserts,
                )
            ):
                need_insert = True

            st = {
                "state": self.state, "n_inliers": n_inl, "n_mm": n_mm,
                "kf": False, "n_kfs": self._n_kfs_cache,
                "n_lms": self._n_lms_cache, "ref_kf_rung": bool(used_ref_kf),
            }

        # a loop correction in this flush's drain rewrote the map: the pend
        # frames were tracked against the PRE-correction map, so their
        # insertion is gated (same rule as the stale_ref marking)
        if need_insert and self.n_loops_closed == loops_before and (
            self._check_kf_capacity()
        ):
            q = pend[-1]
            self._insert_pending(
                q, is_newest=q["traj_idx"] == len(self.trajectory) - 1
            )
            # a frame that became a keyframe is its own reference
            self.rel_trajectory[q["rel_idx"]] = (
                q["ts"], self._n_kfs_cache - 1, np.eye(3), np.zeros(3)
            )
            # entries still pending were tracked BEFORE this insertion:
            # their nRefMatches scalars reference the PREVIOUS keyframe —
            # letting them re-trigger at the next flush would insert one
            # keyframe per flush forever
            for r in self._pending:
                r["stale_ref"] = True
            st["kf"] = True
            st["n_kfs"] = self._n_kfs_cache
        return st

    def _vo_relocalize(self, p: dict) -> bool:
        """mbVO relocalization attempt: if BoW + EPnP relocalization
        succeeds, adopt that pose over the odometric one and leave VO mode
        (Tracking.cc:1299-1326). The map is frozen in localization mode, so
        re-anchoring the relative-trajectory entry to the current reference
        keyframe pose is exact."""
        self.key, sub = self._k.split(self.key)
        out = relocalization.relocalize(
            self.map, p["frame"], self.cam, self.kf_index, sub
        )
        if out is None:
            return False
        self.vo_mode = False
        self.n_relocalizations += 1
        Rcw, tcw = jnp.asarray(out.Rcw), jnp.asarray(out.tcw)
        self.last = dict(
            frame=p["frame"], Rcw=Rcw, tcw=tcw,
            assoc=jnp.asarray(out.assoc), ts=p["ts"],
        )
        self.vel = (jnp.eye(3), jnp.zeros(3))  # motion model cleared
        self.trajectory[p["traj_idx"]] = (p["ts"], Rcw, tcw)
        ref = self._ref_kf_id()
        R_ref, t_ref = self.map.kfs.Rcw[ref], self.map.kfs.tcw[ref]
        Rcr = Rcw @ R_ref.T
        self.rel_trajectory[p["rel_idx"]] = (
            p["ts"], ref, Rcr, tcw - Rcr @ t_ref
        )
        return True

    def _pending_extras(self) -> dict:
        """Extra per-frame bookkeeping for pending entries (VI override
        records the IMU-buffer mark)."""
        return {}

    def _attempt_vision_aid(self, p: dict, is_newest: bool) -> dict | None:
        """Hook: VI override tries vision-only tracking before going LOST
        (visionAidWhenTrackWithIMUFail). None = proceed to LOST."""
        return None

    def _insert_pending(self, p: dict, is_newest: bool):
        """Insert a pending frame as a keyframe (VI override adds IMU
        interval bookkeeping and NavState anchoring)."""
        out = p["out"]
        self._insert_keyframe(
            p["frame"], p["ts"],
            tracking.TrackOutput(
                Rcw=out.Rcw, tcw=out.tcw, assoc=out.assoc,
                n_inliers=out.scalars[0],
            ),
            update_last=is_newest,
        )

    def finish(self):
        """Resolve any deferred decisions (call at end of a sequence).
        Flushing may insert a keyframe (queueing a fresh post job), so the
        drain runs again after the flush — and until no deferred Sim3
        verification remains pending."""
        st = self._flush_decisions()
        self._drain_kf_post()
        while self.loop_closer is not None and self.loop_closer.pending_sim3:
            self._drain_kf_post()
        return st

    def _kf_gap_ok(self, ts: float) -> bool:
        """min_kf_gap_s cadence gate (see __init__): enough time elapsed
        since the newest keyframe for another insertion."""
        if self.min_kf_gap_s <= 0 or self._n_kfs_cache == 0:
            return True
        return ts - self._kf_ts_cache[self._ref_kf_id()] >= self.min_kf_gap_s

    def _ref_kf_id(self) -> int:
        """Index of the current reference keyframe (the newest valid one)."""
        live = np.where(self._kf_valid_cache[: self._n_kfs_cache])[0]
        return int(live[-1]) if len(live) else 0

    def sync_host_mirrors(self):
        """Rebuild the host-side map mirrors from the device map (after
        load_map / any external map replacement). The keyframe BoW index is
        re-populated too, so relocalization (and loop detection) works
        against a loaded map — e.g. the load-then-localize flow of
        ActivateLocalizationMode."""
        self._n_kfs_cache = int(self.map.n_kfs)
        self._n_lms_cache = int(self.map.lms.valid.sum())
        self._kf_valid_cache = np.asarray(self.map.kfs.valid).copy()
        self._kf_ts_cache = np.asarray(self.map.kfs.timestamp, np.float64).copy()
        idx = self.kf_index
        if idx is not None:
            idx.compact(np.zeros(0, np.int64))  # clear
            for k in np.where(self._kf_valid_cache[: self._n_kfs_cache])[0]:
                idx.add(int(k), self.map.kfs.feat_pm1[int(k)],
                        self.map.kfs.feat_valid[int(k)])

    MONOCULAR = True  # StereoSystem overrides (selects thRefRatio + c1c)

    def _register_kf_host(self, new_id: int, ts: float = 0.0):
        """Update the host mirrors after a keyframe insertion."""
        self._n_kfs_cache = new_id + 1
        self._kf_valid_cache[new_id] = True
        self._kf_ts_cache[new_id] = ts
        self.n_kf_insertions += 1

    def _check_kf_capacity(self) -> bool:
        """Keyframe capacity gate with slot recycling: when the append
        cursor hits the fixed-size table, COMPACT — squeeze the live
        keyframes (culling leaves holes) to the front and keep inserting,
        like the reference's unbounded Map::AddKeyFrame + culling
        (src/LocalMapping.cc:2692). Only when the table is full of LIVE
        keyframes does insertion stop, loudly — raise
        SystemConfig.max_keyframes then."""
        if self._n_kfs_cache < self.cap.max_kfs - 1:
            return True
        if self._compact_keyframes() and self._n_kfs_cache < self.cap.max_kfs - 1:
            return True
        self.kf_overflows += 1
        if self.kf_overflows == 1:
            logger.error(
                "keyframe table full (%d live keyframes): no further "
                "keyframes will be inserted — tracking quality will "
                "degrade; raise SystemConfig.max_keyframes",
                self.cap.max_kfs,
            )
        return False

    def _compact_keyframes(self) -> bool:
        """Slot recycling (round-2 VERDICT item 7): renumber live keyframes
        to the front of the table, remapping every slot-indexed structure —
        device tables (ma.compact_keyframes), host mirrors, the BoW index,
        loop-closing state, and the per-frame relative-trajectory
        bookkeeping. Frames whose reference keyframe was culled re-anchor
        to the nearest preceding live keyframe (the array form of the
        reference's mTcp parent re-anchoring in KeyFrame::SetBadFlag,
        src/KeyFrame.cc:1070-1110), so later pose-graph/BA corrections keep
        propagating into the full frame trajectory."""
        self._drain_kf_post()  # job indices would go stale under renumbering
        n = self._n_kfs_cache
        live = np.where(self._kf_valid_cache[:n])[0]
        if len(live) >= n:
            return False  # no holes to reclaim
        K = self.cap.max_kfs

        old2new = np.full(K, -1, np.int64)
        old2new[live] = np.arange(len(live))
        prev_live = np.maximum.accumulate(
            np.where(self._kf_valid_cache[:n], np.arange(n), -1)
        )
        # ONE pose fetch for all re-anchoring compositions
        Rk, tk = (np.asarray(x) for x in jax.device_get(
            (self.map.kfs.Rcw, self.map.kfs.tcw)
        ))
        new_rel = []
        for ts, ref, Rcr, tcr in self.rel_trajectory:
            ref = int(ref)
            if ref < n and old2new[ref] < 0:
                p = int(prev_live[ref])
                if p < 0:
                    p = int(live[0])
                # T_c<-p = T_c<-ref o T_ref<-p
                R_rp = Rk[ref] @ Rk[p].T
                t_rp = tk[ref] - R_rp @ tk[p]
                Rcr = np.asarray(Rcr)
                tcr = Rcr @ t_rp + np.asarray(tcr)
                Rcr = Rcr @ R_rp
                ref = p
            new_rel.append((ts, int(old2new[ref]), Rcr, tcr))
        self.rel_trajectory = new_rel

        perm = np.full(K, -1, np.int32)
        perm[: len(live)] = live
        self.map = self._k.compact(self.map, jnp.asarray(perm))

        n_new = len(live)
        valid = np.zeros(K, bool)
        valid[:n_new] = True
        self._kf_valid_cache = valid
        ts_new = np.zeros(K, np.float64)
        ts_new[:n_new] = self._kf_ts_cache[live]
        self._kf_ts_cache = ts_new
        self._n_kfs_cache = n_new

        self.kf_index.compact(live)
        if self.loop_closer is not None:
            self.loop_closer.consistent_groups = []
            llk = min(self.loop_closer.last_loop_kf, n - 1)
            if llk >= 0:
                anchor = prev_live[llk] if old2new[llk] < 0 else llk
                self.loop_closer.last_loop_kf = (
                    int(old2new[int(anchor)]) if anchor >= 0 else 0
                )
        self._on_compacted(live, old2new)
        self.n_compactions += 1
        logger.info(
            "compacted keyframe table: %d live keyframes (was %d slots used)",
            n_new, n,
        )
        return True

    def _on_compacted(self, live: np.ndarray, old2new: np.ndarray):
        """Hook: VI override regathers the per-slot IMU tables."""

    def _check_lm_capacity(self):
        """Log (once) when the landmark free list runs dry."""
        free = self.cap.max_lms - self._n_lms_cache
        if free <= 1 and not self._lm_overflow_logged:
            self._lm_overflow_logged = True
            logger.error(
                "landmark table full (%d slots): new triangulations are "
                "being dropped; raise SystemConfig.max_landmarks",
                self.cap.max_lms,
            )

    def _need_close_insert(self, frame: FrameData, assoc) -> bool:
        """bNeedToInsertClose (Tracking.cc:2147): stereo/RGB-D only."""
        return False

    def _ref_tracked_async(self):
        """Launch the nRefMatches reduction (ref-KF landmarks with enough
        observations) without blocking — the caller fetches it together
        with the other per-frame scalars in ONE device_get (the per-frame
        host-sync count is the TPU e2e bottleneck, not compute)."""
        n_kfs = self._n_kfs_cache
        min_obs = 2 if n_kfs <= 2 else 3
        return self._ref_tracked(
            self.map,
            jnp.asarray(self._ref_kf_id(), jnp.int32),
            jnp.asarray(min_obs, jnp.int32),
        )

    def _need_new_keyframe(
        self, frame: FrameData, n_inl: int, assoc, n_ref: int | None = None
    ) -> bool:
        """Full NeedNewKeyFrame gate against the live map state."""
        n_kfs = self._n_kfs_cache
        if n_ref is None:
            n_ref = int(self._ref_tracked_async())
        return tracking.need_new_keyframe(
            n_inl,
            n_ref,
            self.frames_since_kf,
            n_kfs=n_kfs,
            frames_since_reloc=self.frames_since_reloc,
            max_frames=self.max_kf_interval,
            monocular=self.MONOCULAR,
            need_close_insert=self._need_close_insert(frame, assoc),
            max_interval_inserts=self.max_interval_inserts,
        )

    def _post_add_kf(self, m, kf_id, frame, track_out):
        """Hook right after keyframe insertion, before triangulation/BA
        (stereo/RGB-D systems spawn depth landmarks here)."""
        return m

    def _cull_keyframes(self, m, new_id, red0: np.ndarray,
                        max_per_round: int = 2):
        """Drop redundant keyframes (LocalMapping::KeyFrameCulling,
        LocalMapping.cc:2692): >= 90% of a keyframe's landmarks seen by
        >= 3 others at same-or-finer scale. Round 0 reads the redundancy
        vector prefetched at insertion time (zero blocking wait); later
        rounds recompute after each cull (removing a supporter can
        de-redundify its neighbors). KF 0 (gauge origin) and the two most
        recent are never culled."""
        for rnd in range(max_per_round):
            if rnd == 0:
                red = np.array(red0)
            else:
                red = np.array(self._k.redundancy(m))
            red[0] = False
            red[max(0, new_id - 1):] = False
            cand = [k for k in np.where(red[: new_id + 1])[0]
                    if self._may_cull(m, int(k))]
            if not cand:
                return m
            # most redundant first = most observations already covered
            k = int(cand[0])
            m = self._k.cull_kf(m, jnp.asarray(k, jnp.int32))
            self._kf_valid_cache[k] = False
            self._on_kf_culled(k)
        return m

    def _may_cull(self, m, k: int) -> bool:
        """Extra per-keyframe cull gate (VI override adds time-gap rules)."""
        return True

    def _on_kf_culled(self, k: int):
        """Bookkeeping hook (VI override merges the IMU interval chain)."""

    def _triangulate_and_fuse(self, m, new_id: int, assoc_row):
        """CreateNewMapPoints + SearchInNeighbors for a fresh keyframe:
        triangulate against the best covisible neighbors, then fuse
        duplicate landmarks between the new keyframe and those neighbors
        (LocalMapping.cc:2223-2594) and refresh landmark descriptors
        (MapPoint::ComputeDistinctiveDescriptors). Neighbor selection runs
        ON DEVICE (kernels.top_neighbors) — the whole stage dispatches with
        zero host fetches. Returns (map, covis-counts device array)."""
        counts = self._k.covis_of_row(m, assoc_row)
        nbs = self._k.top_neighbors(counts, jnp.asarray(new_id, jnp.int32))
        # the whole mapping stage (triangulation x neighbors, neighborhood
        # fusion, dedup, descriptor refresh, geometry, point culling) as ONE
        # program (local_mapping.keyframe_mapping_program)
        with self.times.stage("mapping_program"):
            m = self._k.mapping_program(
                m, jnp.asarray(new_id, jnp.int32), nbs
            )
        # n_lms host mirror refreshes at the deferred post-processing drain
        # — no standalone device sync here
        self.map = m
        return m, counts

    def _insert_keyframe(self, frame: FrameData, ts, track_out, update_last=True):
        """Keyframe insertion: add + triangulate/fuse + local BA, all
        dispatched WITHOUT a single host fetch (neighbor and BA-window
        selection run on device), then the redundancy-culling + loop-detect
        post-processing is queued for the next decision flush
        (_queue_kf_post) so its device compute and transfer latency overlap
        with the following frames' tracking — the pipelining the reference
        gets from its LocalMapping/LoopClosing threads."""
        m = self.map
        new_id = self._n_kfs_cache
        m = self._add_kf(
            m, track_out.Rcw, track_out.tcw, frame.feats, frame.xy_und, ts,
            track_out.assoc, u_right=frame.u_right,
        )
        self._register_kf_host(new_id, ts)
        m = self._post_add_kf(m, new_id, frame, track_out)
        m, counts = self._triangulate_and_fuse(m, new_id, track_out.assoc)

        # local BA: last `local_window` valid KFs free (oldest fixed as
        # gauge anchor) + up to covis_free_extra strongly-covisible older
        # keyframes freed (revisit-drift healing) + top covisible older
        # KFs fixed; selection + gauge rules in kernels.ba_window
        n_kfs = new_id + 1
        kf_valid = self._kf_valid_cache[:n_kfs]
        live = [i for i in range(n_kfs) if kf_valid[i]]
        W = self.local_window
        W_free = min(W, len(live))
        free_ids = live[-W_free:] + [-1] * (W - W_free)
        free_fixed = [True] + [False] * (W_free - 1) + [True] * (W - W_free)
        ids, fixed = self._k.ba_window(
            counts, jnp.asarray(self._kf_valid_cache),
            jnp.asarray(free_ids, jnp.int32), jnp.asarray(free_fixed),
            jnp.asarray(free_ids[0], jnp.int32),
            n_extra=self.covis_free_extra, n_fixed=self.fixed_window,
        )
        with self.times.stage("local_ba"):
            m, self._last_ba_active = self._local_ba(m, ids, fixed)

        self.map = m
        self.ref_kf_tracked = track_out.n_inliers
        self.frames_since_kf = 0
        # refresh last-frame pose after BA (it is the new keyframe) — only
        # when the inserted frame IS the newest tracked frame (deferred
        # decisions may insert an older frame; tracking keeps its state)
        if update_last:
            self.last["Rcw"] = m.kfs.Rcw[new_id]
            self.last["tcw"] = m.kfs.tcw[new_id]
        self._queue_kf_post(new_id)

    # ------------------------------------------------------------------
    # Deferred keyframe post-processing (culling + loop closing).
    # ------------------------------------------------------------------
    def _queue_kf_post(self, new_id: int):
        """Dispatch the post-insertion programs (keyframe redundancy,
        landmark count, loop-detect preliminaries), start their
        device->host copies, and queue the host-side decisions for the next
        decision flush. With decision_lag == 1 the job resolves immediately
        (synchronous semantics)."""
        m = self.map
        ba_act = (
            self._last_ba_active
            if self._last_ba_active is not None
            else jnp.asarray(-1, jnp.int32)
        )
        job = dict(
            new_id=new_id,
            packed=_pack_post(self._k.redundancy(m), self._k.lm_count(m),
                              ba_act),
        )
        self._last_ba_active = None
        if self.loop_closer is not None:
            job["loop"] = self.loop_closer.prepare(m, new_id)
        else:
            self._own_index.add(new_id, m.kfs.feat_pm1[new_id],
                                m.kfs.feat_valid[new_id])
            job["loop"] = None
        copy_async((job["packed"], (job["loop"] or {}).get("dev")))
        self._kf_post = job
        if self.decision_lag == 1:
            self._drain_kf_post()

    def _drain_kf_post(self):
        """Resolve the queued post-insertion job: redundancy-based keyframe
        culling (LocalMapping::KeyFrameCulling) then the loop-closing
        iteration for that keyframe (LoopClosing::Run). By drain time the
        async copies have normally arrived, so this blocks only on real
        decisions."""
        job, self._kf_post = self._kf_post, None
        # deferred Sim3 verifications drain at EVERY flush, job or not
        # (their async copies landed during the flush window)
        if self.loop_closer is not None and self.loop_closer.pending_sim3:
            with self.times.stage("loop_closing"):
                m2, closed = self.loop_closer.drain_sim3(
                    self.map, kf_valid=self._kf_valid_cache,
                    **self._loop_extra_args(),
                )
            if closed:
                self.map = m2
                self.n_loops_closed += 1
                self._on_loop_closed(self._ref_kf_id())
        if job is None:
            return
        arr = np.asarray(jax.device_get(job["packed"]))
        K = self.cap.max_kfs
        red = arr[:K].astype(bool)
        self._n_lms_cache = int(arr[K])
        ba_act = int(arr[K + 1])
        self._check_lm_capacity()
        if (
            ba_act >= 0
            and ba_act >= self._ba_max_active
            and not self._ba_overflow_logged
        ):
            self._ba_overflow_logged = True
            logger.warning(
                "local-BA window observed %d distinct landmarks, at/over "
                "the %d compaction cap: overflow landmarks are held fixed "
                "for the round (accuracy may degrade; raise max_active_lms)",
                int(ba_act), self._ba_max_active,
            )
        with self.times.stage("keyframe_culling"):
            self.map = self._cull_keyframes(self.map, job["new_id"], red)
        if self.loop_closer is not None and job["loop"] is not None:
            self.key, sub = self._k.split(self.key)
            with self.times.stage("loop_closing"):
                m, closed = self.loop_closer.resolve(
                    self.map, job["loop"], sub,
                    kf_valid=self._kf_valid_cache,
                    defer_sim3=self.decision_lag > 1,
                    **self._loop_extra_args(),
                )
            if closed:
                self.map = m
                self.n_loops_closed += 1
                self._on_loop_closed(job["new_id"])

    def _loop_extra_args(self) -> dict:
        """Extra args for LoopCloser.resolve (VI override passes the
        extrinsics + gravity for the NavState-aware correction)."""
        return {}

    def _on_loop_closed(self, new_id: int):
        """Hook after a deferred loop correction rewired the map: the
        tracking chain's last pose predates the correction, so re-anchor
        it through the stored reference-relative transform (the old
        synchronous path refreshed it from the corrected keyframe after
        try_close) and clear the motion model across the jump.

        Pending frames were also tracked against the PRE-correction map:
        their out.Rcw/tcw are inconsistent with the corrected keyframes,
        so gate them out of keyframe insertion (stale_ref — the same
        mechanism the post-insertion path uses; in the reference no
        pre-correction frame can insert because CorrectLoop stops and
        drains LocalMapping first, LoopClosing.cc:460-481). They keep
        participating in LOST detection, and their trajectory entries are
        re-composed through rel_trajectory at save time."""
        for q in self._pending:
            q["stale_ref"] = True
        if self.rel_trajectory and self.last is not None:
            _, ref, Rcr, tcr = self.rel_trajectory[-1]
            R_ref = self.map.kfs.Rcw[int(ref)]
            t_ref = self.map.kfs.tcw[int(ref)]
            Rcr = jnp.asarray(Rcr)
            self.last["Rcw"] = Rcr @ R_ref
            self.last["tcw"] = Rcr @ t_ref + jnp.asarray(tcr)
            self.vel = (jnp.eye(3), jnp.zeros(3))
