"""Whole-system benchmark on one TPU chip.

Primary metric: end-to-end monocular SLAM throughput over a long rendered
sequence — images in, trajectory out. Every stage is inside the timed loop:
ORB extraction (pyramid/FAST/rBRIEF), two-view bootstrap, frame tracking
(ONE fused XLA program per frame, pipeline/tracking.fused_frame_step),
keyframe decision, keyframe insertion (triangulation + fusion + culling as
ONE program, local BA, KF culling, loop-closure detection). This mirrors
the reference's whole-system real-time claim (~20 Hz on an i7,
`/root/reference/README.md:91`, `src/Tracking.cc:81,1071,1261`), so
vs_baseline is the speedup over 20 frames/s.

Also reported (detail):
- the same sequence through the VI pipeline (ViMonoSystem with exact
  synthetic IMU, known Tbc): fps + metric-scale (NOT Sim3-aligned) ATE —
  the reference's headline mode is MonoVI at 20 Hz
  (`Examples/ROS/ORB_VIO/src/ros_vio.cc:297`);
- the per-stage mean-time tree (utils/timing.StageTimes — the reference's
  Timer taxonomy, `include/System.h:282-313`);
- the two isolated hot-stage latencies from round 1, for continuity.

Timing honesty: jitted kernels live in a module-level cache keyed on static
config (pipeline/kernels.py), so the warm-up system and the timed system
share compiled programs — the timed pass measures work, not XLA compiles
(round-2 ADVICE medium finding).

The dataset is rendered on-device by `io/render.py` (textured box room
along the analytic orbit) before timing starts.

Prints ONE JSON line.

Env knobs: VIORB_BENCH_FRAMES (default 500), VIORB_BENCH_FEATURES (1000),
VIORB_BENCH_VI=0 to skip the VI pass.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_dataset(n_frames: int, rcam):
    from viorb_tpu.io import render, synthetic

    rng = np.random.default_rng(7)
    scene = render.box_room(rng)
    stride = 10  # 200 Hz trajectory -> 20 fps camera (EuRoC rate)
    traj = synthetic.circle_trajectory(
        duration=n_frames * stride / 200.0 + 0.1, imu_rate=200.0
    )
    ext = synthetic.euroc_like_extrinsics()
    _, ts, Rwc, twc = render.camera_poses(traj, ext, stride, n_frames)
    # render in chunks to bound device scratch memory
    chunks = []
    for lo in range(0, n_frames, 125):
        hi = min(lo + 125, n_frames)
        chunks.append(render.render_frames_jax(scene, Rwc[lo:hi], twc[lo:hi], rcam))
    imgs = jnp.concatenate(chunks, axis=0)
    jax.block_until_ready(imgs)
    return imgs, ts, twc, traj, ext, stride


def make_system(rcam, n_feat: int):
    from viorb_tpu.map import arrays as ma
    from viorb_tpu.pipeline.system import MonoSystem
    from viorb_tpu.solver.ba import Camera

    cam = Camera(fx=rcam.fx, fy=rcam.fy, cx=rcam.cx, cy=rcam.cy)
    cap = ma.Capacities(max_kfs=128, max_lms=16384, n_feat=n_feat)
    # decision_lag=6: per-frame scalar results fetched in one batched
    # transfer every 6 frames (the remote-tunnel fetch costs ~30-40 ms
    # regardless of size); LOST/keyframe decisions run up to 5 frames late,
    # like the reference's asynchronous LocalMapping
    lag = int(os.environ.get("VIORB_DECISION_LAG", "6"))
    return MonoSystem(cam, rcam.width, rcam.height, cap=cap, decision_lag=lag)


def make_vi_system(rcam, n_feat: int, ext):
    from viorb_tpu.map import arrays as ma
    from viorb_tpu.pipeline.vi_system import ViMonoSystem
    from viorb_tpu.solver.ba import Camera

    cam = Camera(fx=rcam.fx, fy=rcam.fy, cx=rcam.cx, cy=rcam.cy)
    cap = ma.Capacities(max_kfs=128, max_lms=16384, n_feat=n_feat)
    lag = int(os.environ.get("VIORB_DECISION_LAG", "6"))
    return ViMonoSystem(
        cam, rcam.width, rcam.height, cap=cap,
        Rbc=ext.Rbc, pbc=ext.pbc, estimate_extrinsics=False,
        force_init_after_s=10.0, decision_lag=lag,
    )


def run_sequence(sys_, imgs, ts):
    from viorb_tpu.pipeline.system import OK

    n_ok = 0
    for i in range(imgs.shape[0]):
        out = sys_.track_features(sys_.make_frame(imgs[i]), float(ts[i]))
        n_ok += out.get("state") == OK
    sys_.finish()
    return n_ok


def imu_chunks(traj, stride: int, n_frames: int):
    """Per-frame IMU packets [g, a, dt] for samples in (t_{k-1}, t_k]."""
    dt = traj.t[1] - traj.t[0]
    chunks = [np.zeros((0, 7), np.float32)]
    for f in range(1, n_frames):
        k0, k1 = (f - 1) * stride, f * stride
        rows = np.concatenate(
            [traj.gyro[k0:k1], traj.acc[k0:k1],
             np.full((k1 - k0, 1), dt, np.float64)], axis=1,
        )
        chunks.append(rows.astype(np.float32))
    return chunks


def run_vi_sequence(sys_, imgs, ts, chunks):
    from viorb_tpu.pipeline.system import OK

    n_ok = 0
    for i in range(imgs.shape[0]):
        out = sys_.track(sys_.make_frame(imgs[i]), chunks[i], float(ts[i]))
        n_ok += out.get("state") == OK
    sys_.finish()
    return n_ok


def ate_of(sys_, ts, twc_gt, align_scale=True):
    from viorb_tpu.io import evaluate

    ft = sys_.frame_trajectory()
    if len(ft) < 10:
        return float("nan"), 0.0
    p_est = np.stack([-np.asarray(R).T @ np.asarray(t) for _, R, t in ft])
    rmse, scale, _ = evaluate.ate_rmse(
        np.array([x[0] for x in ft]), p_est, ts, twc_gt,
        with_scale=align_scale,
    )
    return rmse, scale


def stage_microbench(rcam, n_feat: int):
    """Round-1 continuity: steady-state latency of the two per-frame hot
    stages (extractor / local-map tracking) in isolation."""
    import __graft_entry__ as g
    from viorb_tpu.ops import orb
    from viorb_tpu.pipeline import tracking

    m, frame, Rl, tl, assoc_last = g._build_map_and_frame(n_feat=n_feat)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 40, (g.H, g.W)).astype(np.float32) + 128.0)
    params = orb.OrbParams(n_features=n_feat, height=g.H, width=g.W)
    extract_jit = jax.jit(lambda im: orb.extract(im, params))
    track_jit = jax.jit(
        lambda *a: tracking.track_local_map(*a, g.CAM, float(g.W), float(g.H))[0].Rcw
    )
    jax.block_until_ready(extract_jit(img))
    jax.block_until_ready(track_jit(m, frame, Rl, tl, assoc_last))

    def timed(fn, n=30, reps=5):
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn()
            jax.block_until_ready(r)
            best.append((time.perf_counter() - t0) / n)
        best.sort()
        return best[len(best) // 2]

    t_extract = timed(lambda: extract_jit(img))
    t_track = timed(lambda: track_jit(m, frame, Rl, tl, assoc_last))
    return t_extract, t_track


def main():
    from viorb_tpu.io import render

    n_frames = int(os.environ.get("VIORB_BENCH_FRAMES", "500"))
    n_feat = int(os.environ.get("VIORB_BENCH_FEATURES", "1000"))
    run_vi = os.environ.get("VIORB_BENCH_VI", "1") == "1"
    rcam = render.RenderCam()

    imgs, ts, twc_gt, traj, ext, stride = build_dataset(n_frames, rcam)

    # warmup pass: compiles every jitted stage (init, tracking rungs,
    # keyframe insertion, BA, fusion, culling, loop detection) into the
    # module-level kernel cache shared by the timed system
    warm = make_system(rcam, n_feat)
    run_sequence(warm, imgs, ts)
    del warm

    sys_ = make_system(rcam, n_feat)
    t0 = time.perf_counter()
    n_ok = run_sequence(sys_, imgs, ts)
    wall = time.perf_counter() - t0
    fps = n_frames / wall
    rmse, _ = ate_of(sys_, ts, twc_gt)
    stages = {
        name: round(sys_.times.mean_ms(name), 2)
        for name in sorted(sys_.times.samples)
    }

    detail = {
        "n_frames": n_frames,
        "n_features": n_feat,
        "wall_s": round(wall, 2),
        "frames_ok": n_ok,
        "n_keyframes": sys_._n_kfs_cache,
        "n_loops_closed": sys_.n_loops_closed,
        "ate_rmse_m": round(rmse, 4),
        "stage_means_ms": stages,
        "device": str(jax.devices()[0]),
    }

    if run_vi:
        chunks = imu_chunks(traj, stride, n_frames)
        warm_vi = make_vi_system(rcam, n_feat, ext)
        run_vi_sequence(warm_vi, imgs, ts, chunks)
        del warm_vi
        vi = make_vi_system(rcam, n_feat, ext)
        t0 = time.perf_counter()
        n_ok_vi = run_vi_sequence(vi, imgs, ts, chunks)
        wall_vi = time.perf_counter() - t0
        # metric-scale ATE: NO scale alignment — the VIO init must have
        # recovered the true scale (reference evaluate_ate_estimatedScale)
        rmse_vi, _ = ate_of(vi, ts, twc_gt, align_scale=False)
        detail["vi"] = {
            "fps": round(n_frames / wall_vi, 2),
            "wall_s": round(wall_vi, 2),
            "frames_ok": n_ok_vi,
            "vins_inited": bool(vi.vins_inited),
            "scale_est": round(float(vi.scale), 4),
            "n_keyframes": vi._n_kfs_cache,
            "ate_rmse_metric_m": round(rmse_vi, 4),
            "stage_means_ms": {
                name: round(vi.times.mean_ms(name), 2)
                for name in sorted(vi.times.samples)
            },
        }

    t_extract, t_track = stage_microbench(rcam, n_feat)
    detail["stage_extract_ms"] = round(t_extract * 1e3, 3)
    detail["stage_track_ms"] = round(t_track * 1e3, 3)

    print(
        json.dumps(
            {
                "metric": "e2e_mono_slam_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
