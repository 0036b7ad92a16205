#!/usr/bin/env python
"""Distributed-BA scaling measurement -> SCALING_r{N}.json.

Measures LM-iteration throughput of the landmark-sharded Schur BA
(parallel/dist_ba.py) at 1/2/4/8 devices on a virtual CPU mesh (the same
harness the driver's dryrun uses), for BOTH the vision and the VI solver.
Efficiency(n) = t(1) / (n * t(n) / n) on a FIXED total problem (strong
scaling): eff = t1 / tn / n... reported as speedup and efficiency.

Evidence for BASELINE.json's >= 0.7 scaling-efficiency target (round-2
VERDICT item 6). Note the virtual devices are threads of one CPU host, so
the collective cost they expose is an upper bound on real ICI cost.

Usage: python tools/measure_scaling.py [round_tag]
"""

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from viorb_tpu.io import synthetic
from viorb_tpu.ops import imu as imu_ops
from viorb_tpu.parallel import dist_ba
from viorb_tpu.solver.ba import Camera, ImuChain, VIBAState, VisionBAState

CAM = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)


def build_vision_problem(K=24, L=16384, seed=0):
    """Dense strong-scaling problem: every camera sees every in-front
    landmark (vectorized construction; ~300k observations)."""
    rng = np.random.default_rng(seed)
    cloud = synthetic.landmark_cloud(rng, n=L)
    traj = synthetic.circle_trajectory(duration=8.0, imu_rate=25.0)
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
        vis = Pc[:, 2] > 0.5
        uv = np.stack(
            [CAM.fx * Pc[:, 0] / np.maximum(Pc[:, 2], 1e-6) + CAM.cx,
             CAM.fy * Pc[:, 1] / np.maximum(Pc[:, 2], 1e-6) + CAM.cy], -1)
        sel = np.where(vis)[0]
        cams.append(np.full(len(sel), ki, np.int32))
        lms.append(sel.astype(np.int32))
        uvs.append(uv[sel] + rng.normal(0, 0.4, (len(sel), 2)))
    cam_idx = np.concatenate(cams)
    lm_idx = np.concatenate(lms)
    uv = np.concatenate(uvs).astype(np.float32)
    state = VisionBAState(
        Rcw=jnp.asarray(np.array(Rcw_l), jnp.float32),
        tcw=jnp.asarray(np.array(tcw_l), jnp.float32),
        points=jnp.asarray(cloud + rng.normal(0, 0.05, cloud.shape), jnp.float32),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    return state, cam_idx, lm_idx, uv, fixed, len(cam_idx)


def build_vi_problem(K=12, L=16384, seed=1):
    rng = np.random.default_rng(seed)
    cloud = synthetic.landmark_cloud(rng, n=L)
    traj = synthetic.circle_trajectory(duration=6.0, imu_rate=100.0)
    ext = synthetic.euroc_like_extrinsics()
    Rcb = jnp.asarray(ext.Rbc.T, jnp.float32)
    pcb = jnp.asarray(-ext.Rbc.T @ ext.pbc, jnp.float32)
    noise = imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE)
    n = len(traj.gyro)
    idx = np.linspace(0, n, K).astype(int)
    dt = 1.0 / 100.0
    pres = []
    for i in range(K - 1):
        lo, hi = idx[i], idx[i + 1]
        pres.append(imu_ops.preintegrate(
            jnp.asarray(traj.gyro[lo:hi], jnp.float32),
            jnp.asarray(traj.acc[lo:hi], jnp.float32),
            jnp.full((hi - lo,), dt, jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32), noise,
        ))
    chain = ImuChain(
        i_idx=jnp.arange(K - 1), j_idx=jnp.arange(1, K),
        pre=jax.tree.map(lambda *xs: jnp.stack(xs), *pres),
        valid=jnp.ones((K - 1,), bool),
    )
    z3 = jnp.zeros((K, 3), jnp.float32)
    nav = imu_ops.NavState(
        p=jnp.asarray(traj.p[idx], jnp.float32),
        v=jnp.asarray(traj.v[idx], jnp.float32),
        R=jnp.asarray(traj.Rwb[idx], jnp.float32),
        bg=z3, ba=z3, dbg=z3, dba=z3,
    )
    cams, lms, uvs = [], [], []
    for ki in range(K):
        R = np.asarray(Rcb) @ traj.Rwb[idx[ki]].T
        t = -R @ traj.p[idx[ki]] + np.asarray(pcb)
        Pc = cloud @ R.T + t
        sel = np.where(Pc[:, 2] > 0.5)[0]
        uv = np.stack(
            [CAM.fx * Pc[sel, 0] / Pc[sel, 2] + CAM.cx,
             CAM.fy * Pc[sel, 1] / Pc[sel, 2] + CAM.cy], -1)
        cams.append(np.full(len(sel), ki, np.int32))
        lms.append(sel.astype(np.int32))
        uvs.append(uv + rng.normal(0, 0.4, uv.shape))
    cam_idx = np.concatenate(cams)
    lm_idx = np.concatenate(lms)
    uv = np.concatenate(uvs).astype(np.float32)
    state = VIBAState(
        nav=nav,
        points=jnp.asarray(cloud + rng.normal(0, 0.03, cloud.shape), jnp.float32),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    return state, cam_idx, lm_idx, uv, fixed, chain, Rcb, pcb, noise, len(cam_idx)


def timed(fn, reps=5):
    fn()  # warm (compiled already, but prime caches)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r02"
    devices = jax.devices("cpu")
    assert len(devices) >= 8, devices
    iters = (5, 10)  # the reference's local-BA schedule (Optimizer.cc:1284)
    n_iters = sum(iters)

    vs, v_cam, v_lm, v_uv, v_fixed, v_nobs = build_vision_problem()
    (vi_s, i_cam, i_lm, i_uv, i_fixed, chain, Rcb, pcb, noise, i_nobs) = (
        build_vi_problem()
    )
    grav = jnp.asarray(synthetic.GRAVITY_W, jnp.float32)
    L = vs.points.shape[0]

    results = {"vision": {}, "vi": {}}
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(devices[:n]), ("lm",))
        obs_v, _ = dist_ba.partition_observations(
            v_cam, v_lm, v_uv, np.ones(v_nobs, np.float32),
            np.ones(v_nobs, bool), L, n,
            obs_per_shard=int(np.ceil(v_nobs / n)) + 64,
        )
        t_v = timed(lambda: dist_ba.distributed_bundle_adjust_vision(
            vs, obs_v, CAM, v_fixed, mesh, n_rounds=2,
            iters_per_round=iters, robust_rounds=(True, True),
        )[0].tcw)
        obs_i, _ = dist_ba.partition_observations(
            i_cam, i_lm, i_uv, np.ones(i_nobs, np.float32),
            np.ones(i_nobs, bool), L, n,
            obs_per_shard=int(np.ceil(i_nobs / n)) + 64,
        )
        t_i = timed(lambda: dist_ba.distributed_bundle_adjust_vi(
            vi_s, obs_i, chain, CAM, Rcb, pcb, grav, noise, i_fixed, mesh,
            n_rounds=2, iters_per_round=iters, robust_rounds=(True, True),
        )[0].nav.p)
        results["vision"][n] = {"s_per_solve": t_v, "iters_per_s": n_iters / t_v}
        results["vi"][n] = {"s_per_solve": t_i, "iters_per_s": n_iters / t_i}
        print(f"n={n}: vision {t_v*1e3:.1f} ms/solve, vi {t_i*1e3:.1f} ms/solve")

    out = {
        "metric": "distributed_ba_strong_scaling",
        "problem": {
            "vision": {"K": 24, "L": L, "n_obs": v_nobs},
            "vi": {"K": 12, "L": L, "n_obs": i_nobs},
            "lm_iters_per_solve": n_iters,
        },
        "device": "cpu-virtual",
        "results": results,
    }
    for kind in ("vision", "vi"):
        t1 = results[kind][1]["s_per_solve"]
        out[f"{kind}_speedup_8x"] = round(t1 / results[kind][8]["s_per_solve"], 3)
        out[f"{kind}_efficiency_8x"] = round(
            t1 / results[kind][8]["s_per_solve"] / 8, 3
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SCALING_{tag}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
