"""Top-level System facade — the public API of the framework.

Mirrors the reference `System` class (`/root/reference/include/System.h:74-193`,
`src/System.cc`): one object wiring the whole pipeline, with the four
tracking entry points, mode switches, trajectory savers, per-stage timing
getters, and shutdown. Additions over the reference: `save_map`/`load_map`
(an explicit TODO at `include/System.h:185-187`) via the array-map pytree.

The reference spawns LocalMapping/LoopClosing/Viewer threads in the ctor
(`src/System.cc:363-377`); the TPU-native pipeline is synchronous and
deterministic, so the facade simply routes to the pipeline objects.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np

from .config import SystemConfig, build_system, config_from_yaml
from .utils import lie
from .utils.timing import StageTimes

MONOCULAR = "monocular"
STEREO = "stereo"
RGBD = "rgbd"
MONO_VI = "mono_vi"


class System:
    """Facade over the Mono/MonoVI/Stereo/RGBD pipelines.

    Usage (mirrors the reference ctor + TrackMonoVI loop,
    Examples/ROS/ORB_VIO/src/ros_vio.cc):

        cfg = viorb_tpu.config_from_yaml("EuRoC.yaml")
        slam = viorb_tpu.System(cfg, sensor=viorb_tpu.MONO_VI)
        for img, imu, ts in stream:
            slam.track_mono_vi(img, imu, ts)
        slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
        slam.shutdown()
    """

    def __init__(self, config: SystemConfig | str, sensor: str | None = None):
        if isinstance(config, str):
            config = config_from_yaml(config)
        self.config = config
        if sensor is None:
            sensor = MONO_VI if config.running_mode == 1 else MONOCULAR
        self.sensor = sensor
        pipe_sensor = None if sensor == MONO_VI else sensor
        self.pipeline = build_system(config, sensor=pipe_sensor)
        # share the pipeline's stage timers: GetTimeOf* covers the full
        # reference taxonomy (track_motion_model/track_local_map/local_ba/
        # create_new_map_points/search_in_neighbors/keyframe_culling/
        # loop_closing/imu_preintegration/track_with_imu/vio_init_attempt)
        self.times = getattr(self.pipeline, "times", None) or StageTimes()
        self._n_frames = 0

    # ------------------------------------------------------------------
    # Tracking entry points (System.cc:74-129, TrackMonocular/Stereo/RGBD).
    # ------------------------------------------------------------------
    def track_monocular(self, image, timestamp: float) -> dict:
        assert self.sensor == MONOCULAR, self.sensor
        return self._timed_track(lambda: self.pipeline.track_image(image, timestamp))

    def track_stereo(self, image_left, image_right, timestamp: float) -> dict:
        assert self.sensor == STEREO, self.sensor
        return self._timed_track(
            lambda: self.pipeline.track_stereo(image_left, image_right, timestamp)
        )

    def track_rgbd(self, image, depth_map, timestamp: float) -> dict:
        assert self.sensor == RGBD, self.sensor
        return self._timed_track(
            lambda: self.pipeline.track_rgbd(image, depth_map, timestamp)
        )

    def track_mono_vi(self, image, imu_samples, timestamp: float) -> dict:
        """imu_samples: (n, 7) rows [gx gy gz ax ay az dt] since the last
        frame (the MsgSynchronizer pairing — io/sync.py builds it)."""
        assert self.sensor == MONO_VI, self.sensor
        if self.config.imu.multiply_g:
            imu_samples = np.asarray(imu_samples, np.float32).copy()
            imu_samples[:, 3:6] *= 9.80665  # IMU.multiplyG (ros_vio.cc:129-162)

        def run():
            with self.times.stage("frame_construction"):
                frame = self.pipeline.make_frame(image)
            return self.pipeline.track(frame, imu_samples, timestamp)

        return self._timed_track(run)

    def track_mono_vi_features(self, frame, imu_samples, timestamp: float) -> dict:
        """Feature-level entry (frontend already run) — test/driver hook."""
        return self._timed_track(
            lambda: self.pipeline.track(frame, imu_samples, timestamp)
        )

    def _timed_track(self, fn) -> dict:
        with self.times.stage("track_total"):
            st = fn()
        self._n_frames += 1
        return st

    # ------------------------------------------------------------------
    # State queries (System.h:96-117, 191-193).
    # ------------------------------------------------------------------
    @property
    def tracking_state(self) -> str:
        return self.pipeline.state

    @property
    def map_changed_counters(self) -> tuple[int, int]:
        """(live keyframes, live landmarks) — Map::KeyFramesInMap /
        MapPointsInMap semantics (culled slots excluded)."""
        m = self.pipeline.map
        return int(np.asarray(m.kfs.valid).sum()), int(np.asarray(m.lms.valid).sum())

    def get_time_of(self, stage: str) -> float:
        """Mean milliseconds of a pipeline stage (GetTimeOf* getters)."""
        return self.times.mean_ms(stage)

    def vins_inited(self) -> bool:
        return bool(getattr(self.pipeline, "vins_inited", False))

    # ------------------------------------------------------------------
    # Localization-only mode (System::ActivateLocalizationMode /
    # DeactivateLocalizationMode, /root/reference/include/System.h:150-152):
    # the map freezes; tracking only localizes (Tracking::mbOnlyTracking
    # with the mbVO visual-odometry sub-mode, src/Tracking.cc:1017-1118).
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        self.pipeline.activate_localization_mode()

    def deactivate_localization_mode(self):
        self.pipeline.deactivate_localization_mode()

    @property
    def only_tracking(self) -> bool:
        return self.pipeline.only_tracking

    # ------------------------------------------------------------------
    # Trajectory savers (System.cc SaveTrajectoryTUM / KITTI / NavState).
    # ------------------------------------------------------------------
    def _keyframes(self):
        m = self.pipeline.map
        n = int(m.n_kfs)
        ts = np.asarray(m.kfs.timestamp[:n])
        R = np.asarray(m.kfs.Rcw[:n])
        t = np.asarray(m.kfs.tcw[:n])
        ok = np.asarray(m.kfs.valid[:n])
        return ts[ok], R[ok], t[ok]

    def save_keyframe_trajectory_tum(self, path: str):
        """TUM format: t x y z qx qy qz qw of the camera-in-world pose."""
        ts, R, t = self._keyframes()
        with open(path, "w") as f:
            for i in range(len(ts)):
                Rwc = R[i].T
                c = -Rwc @ t[i]
                q = np.asarray(lie.quat_from_matrix(Rwc))  # (w, x, y, z)
                f.write(
                    f"{ts[i]:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_tum(self, path: str):
        """Full-frame TUM trajectory via the stored relative poses composed
        with the (optimized) keyframe poses (Tracking.cc:1525-1541)."""
        with open(path, "w") as f:
            for ts, Rcw, tcw in self.pipeline.frame_trajectory():
                Rwc = Rcw.T
                c = -Rwc @ tcw
                q = np.asarray(lie.quat_from_matrix(Rwc))
                f.write(
                    f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 numbers per line, row-major Twc 3x4."""
        with open(path, "w") as f:
            for ts, Rcw, tcw in self.pipeline.frame_trajectory():
                Rwc = Rcw.T
                c = -Rwc @ tcw
                T = np.hstack([Rwc, c[:, None]])
                f.write(" ".join(f"{v:.9e}" for v in T.reshape(-1)) + "\n")

    def save_keyframe_trajectory_navstate(self, path: str):
        """17-column NavState dump: t P q(xyzw) V bg+dbg ba+dba
        (System::SaveKeyFrameTrajectoryNavState, System.cc:155-201)."""
        m = self.pipeline.map
        n = int(m.n_kfs)
        nav = m.kfs.nav
        ok = np.where(np.asarray(m.kfs.valid[:n]))[0]  # culled KFs excluded
        ts = np.asarray(m.kfs.timestamp[:n])[ok]
        P = np.asarray(nav.p[:n])[ok]
        V = np.asarray(nav.v[:n])[ok]
        Rwb = np.asarray(nav.R[:n])[ok]
        bg = (np.asarray(nav.bg[:n]) + np.asarray(nav.dbg[:n]))[ok]
        ba = (np.asarray(nav.ba[:n]) + np.asarray(nav.dba[:n]))[ok]
        with open(path, "w") as f:
            for i in range(len(ok)):
                q = np.asarray(lie.quat_from_matrix(Rwb[i]))  # (w,x,y,z)
                row = [ts[i], *P[i], q[1], q[2], q[3], q[0], *V[i], *bg[i], *ba[i]]
                f.write(" ".join(f"{v:.7f}" for v in row) + "\n")

    # ------------------------------------------------------------------
    # Map checkpoint / resume (reference TODO at System.h:185-187 — the
    # array map is a pytree, so this is one serialization call).
    # ------------------------------------------------------------------
    def save_map(self, path: str):
        m = self.pipeline.map
        leaves, treedef = jax.tree.flatten(m)
        np.savez_compressed(
            path,
            *[np.asarray(x) for x in leaves],
            treedef=pickle.dumps(treedef),
        )

    def load_map(self, path: str):
        data = np.load(path, allow_pickle=False)
        treedef = pickle.loads(data["treedef"].tobytes())
        leaves = [data[f"arr_{i}"] for i in range(len(data.files) - 1)]
        import jax.numpy as jnp

        self.pipeline.map = jax.tree.unflatten(
            treedef, [jnp.asarray(x) for x in leaves]
        )
        self.pipeline.sync_host_mirrors()

    # ------------------------------------------------------------------
    def reset(self):
        self.pipeline.reset()
        self.times.reset()
        self._n_frames = 0

    def shutdown(self) -> str:
        """Final timing report (the reference prints the mean-time tree at
        shutdown, ros_vio.cc:242-249)."""
        rep = self.times.report()
        if self.config.display_time_statistic:
            print(rep)
        return rep
