"""Stereo and RGB-D SLAM systems (reference TrackStereo / TrackRGBD paths).

Differences from the monocular pipeline, mirroring the reference Tracking:

- `StereoInitialization` (Tracking.cc:1560-1614): the FIRST frame with
  > 500 features becomes keyframe 0 at the origin; every feature with a
  valid depth is unprojected into a landmark immediately — no two-view
  bootstrap and no scale ambiguity.
- Pose optimization uses the 3-row stereo residual (u, v, u_right) with
  chi2 7.815 on depth-bearing features (solver/pose.py PoseObs stereo
  fields).
- `CreateNewKeyFrame` (Tracking.cc:2240-2300): on keyframe insertion, close
  unmatched depth points (depth < thDepth) are unprojected into new
  landmarks (at most ~100 beyond the close set, sorted by depth).
- Loop closing runs with fix_scale=True (the reference selects the
  fixed-scale Sim3 solver and OptimizeEssentialGraph for stereo/RGBD).

The RGB-D system is the stereo system with depths read from the depth
image (ops/stereo.depth_from_rgbd) instead of stereo matching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..map import arrays as ma
from ..ops import orb, stereo as stereo_ops
from ..solver.ba import Camera
from . import loop_closing
from .system import NOT_INITIALIZED, OK, MonoSystem
from .tracking import FrameData


def unproject(xy: jax.Array, depth: jax.Array, Rcw, tcw, cam: Camera):
    """Frame::UnprojectStereo: pixel + depth -> world point."""
    z = depth
    x = (xy[:, 0] - cam.cx) * z / cam.fx
    y = (xy[:, 1] - cam.cy) * z / cam.fy
    Pc = jnp.stack([x, y, z], -1)
    return jnp.einsum("ji,nj->ni", Rcw, Pc - tcw)


class StereoSystem(MonoSystem):
    """Stereo SLAM (reference: System::TrackStereo, runningMode 0 stereo)."""

    def __init__(
        self,
        cam: Camera,  # cam.bf must be set (baseline * fx)
        width: int,
        height: int,
        cap: ma.Capacities = ma.Capacities(),
        th_depth: float = 35.0,  # ThDepth yaml key (EuRoC.yaml:118)
        min_init_features: int = 500,
        **kw,
    ):
        assert cam.bf > 0, "stereo needs cam.bf = baseline * fx"
        super().__init__(cam, width, height, cap=cap, **kw)
        if self.loop_closer is not None:
            self.loop_closer.fix_scale = True
        self.baseline = cam.bf / cam.fx
        self.th_depth = self.baseline * th_depth  # metric close threshold
        self.min_init_features = min_init_features
        self._match_stereo = jax.jit(
            lambda fl, fr, il, ir: stereo_ops.match_stereo(
                fl, fr, il, ir, cam.bf, min_z=self.baseline
            )
        )
        self._unproject = jax.jit(
            lambda xy, d, R, t: unproject(xy, d, R, t, cam)
        )

    # ------------------------------------------------------------------
    def make_stereo_frame(self, img_l, img_r) -> FrameData:
        """Stereo input is assumed rectified (the reference's stereo path
        likewise expects rectified pairs); RGB-D cameras may still carry
        distortion, handled by the inherited undistortion."""
        fl = self._extract(img_l)
        fr = self._extract(img_r)
        sd = self._match_stereo(fl, fr, img_l, img_r)
        xy_und = fl.xy if self.dist.is_zero else self._undistort(fl.xy)
        return FrameData(
            feats=fl, xy_und=xy_und, u_right=sd.u_right, depth=sd.depth
        )

    def track_stereo(self, img_l, img_r, timestamp: float) -> dict:
        return self.track_features(self.make_stereo_frame(img_l, img_r), timestamp)

    # ------------------------------------------------------------------
    def _try_initialize(self, frame: FrameData, ts: float) -> dict:
        """StereoInitialization: single-frame bootstrap from depth."""
        n_feat = int(frame.feats.valid.sum())
        if n_feat <= self.min_init_features:
            return {"state": self.state, "n_features": n_feat}

        m = self.map
        N = self.cap.n_feat
        assoc_empty = jnp.full((N,), -1, jnp.int32)
        m = self._add_kf(
            m, jnp.eye(3), jnp.zeros(3), frame.feats, frame.xy_und, ts,
            assoc_empty, u_right=frame.u_right,
        )
        m = self._spawn_depth_landmarks(
            m, 0, frame, jnp.eye(3), jnp.zeros(3),
            only_close=False, skip_matched=False,
        )
        m = ma.update_landmark_geometry(m, jnp.arange(self.cap.max_lms))
        self.map = m
        self._register_kf_host(0, ts)
        self._n_lms_cache = int(m.lms.valid.sum())
        self.kf_index.add(0, m.kfs.feat_pm1[0], m.kfs.feat_valid[0])

        self.last = dict(
            frame=frame, Rcw=jnp.eye(3), tcw=jnp.zeros(3),
            assoc=m.assoc[0], ts=ts,
        )
        self.vel = (jnp.eye(3), jnp.zeros(3))
        self.ref_kf_tracked = int((np.asarray(m.assoc[0]) >= 0).sum())
        self.frames_since_kf = 0
        self.state = OK
        self.trajectory.append((ts, np.eye(3), np.zeros(3)))
        self.rel_trajectory.append((ts, 0, np.eye(3), np.zeros(3)))
        return {
            "state": self.state, "init": True,
            "n_lms": int(self.map.n_lms),
        }

    # ------------------------------------------------------------------
    def _spawn_depth_landmarks(
        self, m, kf_id, frame: FrameData, Rcw, tcw,
        only_close: bool = True, skip_matched: bool = True,
    ):
        """Unproject depth-bearing features into new landmarks
        (StereoInitialization / CreateNewKeyFrame close-point logic)."""
        ok = frame.feats.valid & (frame.depth > 0)
        if only_close:
            ok = ok & (frame.depth < self.th_depth)
        if skip_matched:
            ok = ok & (m.assoc[kf_id] < 0)
        Pw = self._unproject(frame.xy_und, jnp.maximum(frame.depth, 1e-6), Rcw, tcw)
        d = jnp.linalg.norm(Pw + jnp.einsum("ji,j->i", Rcw, tcw), axis=-1)
        level = frame.feats.octave.astype(Pw.dtype)
        dist_max = d * (1.2 ** level)
        dist_min = dist_max / (1.2 ** 7)
        center = -jnp.einsum("ji,j->i", Rcw, tcw)
        normal = Pw - center
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
        )
        N = frame.xy_und.shape[0]
        return ma.add_landmarks(
            m,
            pos=Pw,
            pm1=frame.feats.desc_pm1,
            normal=normal,
            dist_min=dist_min,
            dist_max=dist_max,
            kf_a=jnp.asarray(kf_id),
            kf_b=jnp.asarray(kf_id),
            feat_a=jnp.arange(N),
            feat_b=jnp.arange(N),
            ok=ok,
        )

    MONOCULAR = False

    def _need_close_insert(self, frame: FrameData, assoc) -> bool:
        """bNeedToInsertClose (Tracking.cc:2131-2148): < 100 tracked close
        points while > 70 close depth features are untracked."""
        close = np.asarray(
            frame.feats.valid
            & (frame.depth > 0)
            & (frame.depth < self.th_depth)
        )
        tracked = np.asarray(assoc >= 0)
        n_tracked = int((close & tracked).sum())
        n_untracked = int((close & ~tracked).sum())
        return n_tracked < 100 and n_untracked > 70

    def _post_add_kf(self, m, kf_id, frame: FrameData, track_out):
        """Create landmarks from close unmatched depth features before
        triangulation / local BA (CreateNewKeyFrame, Tracking.cc:2240-2300)."""
        m = self._spawn_depth_landmarks(
            m, kf_id, frame, m.kfs.Rcw[kf_id], m.kfs.tcw[kf_id]
        )
        return ma.update_landmark_geometry(m, jnp.arange(self.cap.max_lms))


class RgbdSystem(StereoSystem):
    """RGB-D SLAM (reference: System::TrackRGBD; rgbd_tum driver)."""

    def __init__(self, cam: Camera, width: int, height: int,
                 depth_map_factor: float = 1.0, **kw):
        super().__init__(cam, width, height, **kw)
        self.depth_map_factor = depth_map_factor
        self._depth_lookup = jax.jit(
            lambda f, d: stereo_ops.depth_from_rgbd(f, d, cam.bf)
        )

    def make_rgbd_frame(self, img, depth_map) -> FrameData:
        feats = self._extract(img)
        d = depth_map * self.depth_map_factor
        sd = self._depth_lookup(feats, d)
        xy_und = feats.xy if self.dist.is_zero else self._undistort(feats.xy)
        return FrameData(
            feats=feats, xy_und=xy_und, u_right=sd.u_right, depth=sd.depth
        )

    def track_rgbd(self, img, depth_map, timestamp: float) -> dict:
        return self.track_features(self.make_rgbd_frame(img, depth_map), timestamp)
