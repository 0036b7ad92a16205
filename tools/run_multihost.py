#!/usr/bin/env python
"""Multi-host distributed-BA driver.

Launch ONE instance per host/process; they form a global JAX runtime and
run the landmark-sharded Schur BA (parallel/dist_ba.py, unchanged) over a
process-spanning mesh. The reference has no multi-process mode at all
(SURVEY.md section 2.4) — this is the TPU-native scale-out path for
BASELINE's "2+ hosts" target.

TPU pod (one process per host; auto-discovery):
    python tools/run_multihost.py

CPU smoke (2 processes x 2 virtual devices on one machine):
    python tools/run_multihost.py --coordinator localhost:9876 \
        --num-processes 2 --process-id 0 --cpu-devices 2 --out out0.json &
    python tools/run_multihost.py --coordinator localhost:9876 \
        --num-processes 2 --process-id 1 --cpu-devices 2 &

Process 0 writes a JSON summary (initial/final cost, pose checksum) to
--out; tests/test_multihost.py asserts it matches a single-process run of
the same seeded problem.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem(K=8, L=1024, seed=0):
    """Deterministic synthetic BA problem (same on every process)."""
    import numpy as np

    from viorb_tpu.io import synthetic
    from viorb_tpu.solver.ba import Camera, VisionBAState
    import jax.numpy as jnp

    cam = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)
    rng = np.random.default_rng(seed)
    cloud = synthetic.landmark_cloud(rng, n=L)
    traj = synthetic.circle_trajectory(duration=4.0, imu_rate=50.0)
    ext = synthetic.euroc_like_extrinsics()
    idx = np.linspace(0, len(traj.t) - 1, K).astype(int)
    cams, lms, uvs = [], [], []
    Rcw_l, tcw_l = [], []
    for ki, k in enumerate(idx):
        R = (traj.Rwb[k] @ ext.Rbc).T
        t = -R @ (traj.p[k] + traj.Rwb[k] @ ext.pbc)
        Rcw_l.append(R)
        tcw_l.append(t)
        Pc = cloud @ R.T + t
        sel = np.where(Pc[:, 2] > 0.5)[0]
        uv = np.stack(
            [cam.fx * Pc[sel, 0] / Pc[sel, 2] + cam.cx,
             cam.fy * Pc[sel, 1] / Pc[sel, 2] + cam.cy], -1)
        cams.append(np.full(len(sel), ki, np.int32))
        lms.append(sel.astype(np.int32))
        uvs.append(uv + rng.normal(0, 0.4, uv.shape))
    state = VisionBAState(
        Rcw=jnp.asarray(np.array(Rcw_l), jnp.float32),
        tcw=jnp.asarray(np.array(tcw_l), jnp.float32),
        points=jnp.asarray(
            cloud + rng.normal(0, 0.05, cloud.shape), jnp.float32
        ),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    return (
        cam, state, np.concatenate(cams), np.concatenate(lms),
        np.concatenate(uvs).astype(np.float32), fixed,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="virtual CPU devices per process (CPU smoke mode)")
    ap.add_argument("--out", default=None, help="JSON summary path (rank 0)")
    ap.add_argument("--landmarks", type=int, default=1024)
    ap.add_argument("--keyframes", type=int, default=8)
    args = ap.parse_args()

    from viorb_tpu.parallel import multihost

    multihost.init_multihost(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_devices_per_process=args.cpu_devices,
    )

    import numpy as np
    import jax

    from viorb_tpu.parallel import dist_ba
    from viorb_tpu.solver import ba

    pid = jax.process_index()
    n_dev = jax.device_count()
    print(f"[proc {pid}] {jax.process_count()} processes, "
          f"{n_dev} global devices", flush=True)

    cam, state, cam_idx, lm_idx, uv, fixed = build_problem(
        K=args.keyframes, L=args.landmarks
    )
    L = state.points.shape[0]
    assert L % n_dev == 0, (L, n_dev)
    obs, dropped = dist_ba.partition_observations(
        cam_idx, lm_idx, uv, np.ones(len(cam_idx), np.float32),
        np.ones(len(cam_idx), bool), L, n_dev,
        obs_per_shard=int(np.ceil(len(cam_idx) / n_dev)) + 64,
    )

    mesh = multihost.global_mesh()
    state_g, obs_g = multihost.put_problem_vision(state, obs, mesh)

    # initial cost on the host copy (identical on all processes)
    glob_lm = np.asarray(obs.lm_idx).reshape(n_dev, -1) + (
        np.arange(n_dev) * (L // n_dev)
    )[:, None]
    obs_host = obs._replace(lm_idx=np.asarray(glob_lm.reshape(-1)))
    c0 = float(ba._vision_chi2(state, obs_host, cam, robust=False))

    out, obs2 = dist_ba.distributed_bundle_adjust_vision(
        state_g, obs_g, cam, fixed, mesh
    )
    from jax.experimental import multihost_utils

    # replicated arrays: every local shard holds the full value
    Rcw = np.asarray(out.Rcw.addressable_shards[0].data)
    tcw = np.asarray(out.tcw.addressable_shards[0].data)
    # landmark-sharded arrays: gather the shards across processes
    valid2 = np.asarray(
        multihost_utils.process_allgather(obs2.valid, tiled=True)
    )
    pts = np.asarray(
        multihost_utils.process_allgather(out.points, tiled=True)
    )
    from viorb_tpu.solver.ba import VisionBAState

    out_host = VisionBAState(Rcw=Rcw, tcw=tcw, points=pts)
    c1 = float(ba._vision_chi2(
        out_host, obs_host._replace(valid=valid2), cam, robust=False
    ))
    summary = {
        "processes": jax.process_count(),
        "devices": n_dev,
        "cost_initial": c0,
        "cost_final": c1,
        "dropped_obs": dropped,
        "tcw_checksum": float(np.abs(tcw).sum()),
    }
    print(f"[proc {pid}] {json.dumps(summary)}", flush=True)
    if pid == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
