"""Diagnostic driver for the online-calibration e2e path (VERDICT r4 #1).

Replays tests/test_calibration_e2e.py with verbose per-attempt output:
estimates, trailing-window standard deviations of the convergence
monitors, keyframe-table pressure — so the convergence starvation can be
attributed (noisy estimates vs too-short window vs KF starvation).

Usage: JAX_PLATFORMS=cpu python tools/diag_calib.py [n_frames]
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _fixtures import render_vi_sequence

from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline import vio_init
from viorb_tpu.pipeline.system import OK
from viorb_tpu.pipeline.vi_system import ViMonoSystem
from viorb_tpu.solver.ba import Camera

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 220


def main():
    import json
    import time

    t0 = time.perf_counter()
    tkw = json.loads(os.environ.get("VIORB_DIAG_TRAJ", "{}"))
    imgs, ts, twc_gt, traj, ext, chunks, rcam = render_vi_sequence(
        N_FRAMES, **tkw
    )
    print(f"[{time.perf_counter()-t0:.1f}s] rendered {N_FRAMES} frames", flush=True)

    cam = Camera(fx=rcam.fx, fy=rcam.fy, cx=rcam.cx, cy=rcam.cy)
    n_feat = int(os.environ.get("VIORB_DIAG_FEAT", "384"))
    lw = int(os.environ.get("VIORB_DIAG_LW", "5"))
    mk = int(os.environ.get("VIORB_DIAG_MAXKF", "48"))
    cap = ma.Capacities(max_kfs=mk, max_lms=4096, n_feat=n_feat)
    sys_ = ViMonoSystem(
        cam, rcam.width, rcam.height, cap=cap,
        Rbc=None, pbc=None, estimate_extrinsics=True,
        local_window=lw, fixed_window=lw + 1, enable_loop_closing=False,
        min_init_kfs=8, vision_aid_when_imu_fails=True,
        vio_tmp_path="/tmp/calib_diag",
        min_kf_gap_s=float(os.environ.get("VIORB_DIAG_GAP", "0.25")),
    )

    gt_rbc_eul = vio_init.euler_zyx_deg(np.asarray(ext.Rbc))

    orig_try = sys_._try_init_vio

    def wrapped(ts_):
        r = orig_try(ts_)
        mr, mp = sys_.mon_rbc, sys_.mon_pbc
        if mr.ts:
            sel_r = np.stack([v for t, v in zip(mr.ts, mr.vals)
                              if t > ts_ - mr.window_s and np.isfinite(v).all()]) \
                if any(t > ts_ - mr.window_s for t in mr.ts) else np.zeros((0, 3))
            sel_p = np.stack([v for t, v in zip(mp.ts, mp.vals)
                              if t > ts_ - mp.window_s and np.isfinite(v).all()]) \
                if any(t > ts_ - mp.window_s for t in mp.ts) else np.zeros((0, 3))
            std_r = np.std(sel_r, axis=0, ddof=1) if len(sel_r) > 1 else np.full(3, np.nan)
            std_p = np.std(sel_p, axis=0, ddof=1) if len(sel_p) > 1 else np.full(3, np.nan)
            live = int(sys_._kf_valid_cache.sum())
            eul = mr.vals[-1]
            pbc = mp.vals[-1]
            print(
                f"attempt t={ts_:7.3f} nkf={sys_._n_kfs_cache:3d} live={live:3d} "
                f"eul=({eul[0]:8.3f},{eul[1]:8.3f},{eul[2]:8.3f}) "
                f"err=({eul[0]-gt_rbc_eul[0]:7.3f},{eul[1]-gt_rbc_eul[1]:7.3f},{eul[2]-gt_rbc_eul[2]:7.3f}) "
                f"pbc=({pbc[0]:7.4f},{pbc[1]:7.4f},{pbc[2]:7.4f}) "
                f"nwin={len(sel_r)} stdR=({std_r[0]:.4f},{std_r[1]:.4f},{std_r[2]:.4f}) "
                f"stdP=({std_p[0]:.5f},{std_p[1]:.5f},{std_p[2]:.5f}) "
                f"-> {'INIT' if r else '...'}",
                flush=True,
            )
        return r

    sys_._try_init_vio = wrapped

    states = []
    for i in range(N_FRAMES):
        out = sys_.track(
            sys_.make_frame(jnp.asarray(imgs[i])), chunks[i], float(ts[i])
        )
        states.append(out.get("state"))
        if i % 20 == 0 or states[-1] not in (OK, "NOT_INITIALIZED"):
            print(f"[{time.perf_counter()-t0:.1f}s] frame {i} state={states[-1]} "
                  f"nkf={sys_._n_kfs_cache} inited={sys_.vins_inited} "
                  f"ninl={out.get('n_inliers')} nmm={out.get('n_mm')}",
                  flush=True)
    sys_.finish()

    ok_frac = sum(s == OK for s in states[20:]) / len(states[20:])
    print(f"DONE ok_frac={ok_frac:.3f} vins_inited={sys_.vins_inited} "
          f"nkf={sys_._n_kfs_cache} overflows={sys_.kf_overflows} "
          f"compactions={sys_.n_compactions} "
          f"wall={time.perf_counter()-t0:.1f}s", flush=True)
    if sys_.vins_inited:
        Rbc_est = np.asarray(sys_.Rcb).T
        pbc_est = -Rbc_est @ np.asarray(sys_.pcb)
        R_err = Rbc_est.T @ np.asarray(ext.Rbc)
        ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
        print(f"Rbc err {ang:.4f} deg; pbc err {np.abs(pbc_est - np.asarray(ext.pbc))}")


if __name__ == "__main__":
    main()
