"""visionAidWhenTrackWithIMUFail glue (ViMonoSystem._vision_aid):
NavState rebuild from the vision pose with IMU-predicted velocity/biases
carried over (Tracking.cc:1092-1117,1346-1349)."""

import jax.numpy as jnp
import numpy as np

from viorb_tpu.ops import imu as imu_ops
from viorb_tpu.pipeline import system as sys_mod
from viorb_tpu.pipeline.vi_system import ViMonoSystem, navstate_to_camera
from viorb_tpu.map import arrays as ma
from viorb_tpu.solver.ba import Camera

CAM = Camera(fx=400.0, fy=400.0, cx=320.0, cy=240.0)


def make_vi_system():
    cap = ma.Capacities(max_kfs=8, max_lms=256, n_feat=64)
    Rbc = np.eye(3)
    return ViMonoSystem(
        CAM, 640, 480, cap=cap, Rbc=Rbc, pbc=np.zeros(3),
        vision_aid_when_imu_fails=True, enable_loop_closing=False,
    )


def pred_navstate():
    return imu_ops.NavState(
        p=jnp.asarray([1.0, 2.0, 3.0]),
        v=jnp.asarray([0.5, -0.2, 0.1]),
        R=jnp.eye(3),
        bg=jnp.asarray([0.01, 0.0, -0.01]),
        ba=jnp.asarray([0.1, 0.0, 0.0]),
        dbg=jnp.zeros(3), dba=jnp.zeros(3),
    )


def test_vision_aid_rebuilds_navstate(monkeypatch):
    s = make_vi_system()
    Rcw = np.asarray(jnp.eye(3))
    tcw = np.array([0.3, -0.1, 0.5], np.float32)

    def fake_track(self, frame, ts):
        self.last = dict(frame=frame, Rcw=jnp.asarray(Rcw),
                         tcw=jnp.asarray(tcw), assoc=None, ts=ts)
        return {"state": "OK", "n_inliers": 55}

    monkeypatch.setattr(sys_mod.MonoSystem, "_track", fake_track)
    ns_pred = pred_navstate()
    st = s._vision_aid(frame=None, ts=1.0, ns_pred=ns_pred)
    assert st is not None and st["vision_aid"]
    # body pose now matches the vision camera pose through the extrinsics
    Rcw2, tcw2 = navstate_to_camera(s.ns, s.Rcb, s.pcb)
    np.testing.assert_allclose(np.asarray(Rcw2), Rcw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tcw2), tcw, atol=1e-6)
    # velocity and biases carried over from the IMU prediction
    np.testing.assert_allclose(np.asarray(s.ns.v), np.asarray(ns_pred.v))
    np.testing.assert_allclose(np.asarray(s.ns.bg), np.asarray(ns_pred.bg))


def test_vision_aid_skipped_for_vision_tracked_pending(monkeypatch):
    """Regression (round-3 red test): pending entries created by
    MonoSystem._track (vision-aid / recovery / pre-init frames) carry only
    imu_mark, not vs_kf/ns_base. When such a frame drops below the inlier
    threshold while vins_inited, _attempt_vision_aid must return None
    (-> LOST) instead of raising KeyError at p["vs_kf"]."""
    s = make_vi_system()
    s.vins_inited = True
    p = {"frame": None, "ts": 2.0, "imu_mark": 0}  # MonoSystem._pending_extras shape

    called = []

    def fake_aid(self, frame, ts, ns_pred):
        called.append(1)
        return {"state": "OK"}

    monkeypatch.setattr(ViMonoSystem, "_vision_aid", fake_aid)
    assert s._attempt_vision_aid(p, is_newest=True) is None
    assert not called  # never re-aided a frame that already failed vision


def test_vision_aid_fails_when_vision_lost(monkeypatch):
    s = make_vi_system()

    def fake_track(self, frame, ts):
        self.state = "LOST"
        return {"state": "LOST", "n_inliers": 0}

    monkeypatch.setattr(sys_mod.MonoSystem, "_track", fake_track)
    assert s._vision_aid(frame=None, ts=1.0, ns_pred=pred_navstate()) is None
