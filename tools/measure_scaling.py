#!/usr/bin/env python
"""Distributed-BA scaling measurement -> SCALING_r{N}.json.

Round-3 redesign (round-2 VERDICT item 3). Round 2 measured strong scaling
of a WINDOW-sized problem (K=24, L=16k) on 8 virtual CPU devices and found
anti-scaling (efficiency 0.097): at that size the psum of the dense (K*D)^2
reduced camera system plus a replicated Cholesky dwarfs the per-shard
landmark work. Two things changed:

1. The problem is config-4 scale (K=256 cameras, L=65,536 landmarks,
   ~1M observations — the KITTI-00 global-BA regime SURVEY section 7
   targets), where per-shard work is hundreds of GFLOP per LM iteration.
2. The RCS solve can run as reduce_scatter + distributed PCG
   (parallel/dist_ba.py rcs_solver="pcg"), removing both the full-matrix
   all-reduce and the replicated factorization.

What this machine can and cannot measure, honestly:

- This host has TWO physical CPU cores (`nproc`). Eight virtual XLA
  devices timeshare them, so a virtual-mesh strong-scaling curve CANNOT
  exceed ~2x speedup no matter how good the algorithm is; the VERDICT's
  escape hatch ("if the virtual-CPU mesh provably can't show it, an ICI
  roofline analysis plus the largest measured configuration") applies.
- The real TPU is ONE chip; multi-chip ICI cannot be measured directly.

So the measurement is a hybrid:
  (a) REAL-TPU per-shard kernel timing: one LM iteration of the Schur RCS
      assembly at shard sizes L/n for n in {1,2,4,8,16}, on the actual
      chip. This is the quantity that parallelizes; its measured curve is
      the compute term of the scaling model.
  (b) ICI communication model: per iteration the only cross-shard traffic
      is the RCS reduction — psum moves 2*(n-1)/n * (K*D)^2 * 4 bytes per
      chip; reduce_scatter+PCG moves (K*D)^2*4/n + n_cg * K*D * 4 *
      2(n-1)/n. Bandwidth assumed 4.5e10 B/s effective per chip (v5e ICI
      ~400 GB/s aggregate; the factor-10 margin keeps the model
      conservative).
  (c) projected efficiency(n) = t_shard(L) / (n * (t_shard(L/n) + t_comm)).
  (d) a virtual-CPU 2-device consistency run (distributed == single-device
      result) at reduced size, as an execution check (test_dist_ba.py
      carries the 8-device equivalence tests).

Usage: python tools/measure_scaling.py [round_tag]   (runs on the TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from viorb_tpu.io import synthetic
from viorb_tpu.solver import ba, schur
from viorb_tpu.solver.ba import BAObservations, Camera, VisionBAState

CAM = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)
K = 256
L = 65536
D = 6
ICI_BW = 4.5e10  # bytes/s effective per chip (conservative)


def build_problem(seed=0, obs_per_cam=4096):
    """K cameras around two stacked orbits observing a 65k cloud."""
    rng = np.random.default_rng(seed)
    cloud = synthetic.landmark_cloud(rng, n=L)
    traj = synthetic.circle_trajectory(duration=30.0, imu_rate=20.0)
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
        vis = np.where(Pc[:, 2] > 0.5)[0]
        sel = vis[rng.permutation(len(vis))[:obs_per_cam]]
        uv = np.stack(
            [CAM.fx * Pc[sel, 0] / Pc[sel, 2] + CAM.cx,
             CAM.fy * Pc[sel, 1] / Pc[sel, 2] + CAM.cy], -1)
        cams.append(np.full(len(sel), ki, np.int32))
        lms.append(sel.astype(np.int32))
        uvs.append(uv + rng.normal(0, 0.4, uv.shape))
    state = VisionBAState(
        Rcw=jnp.asarray(np.array(Rcw_l), jnp.float32),
        tcw=jnp.asarray(np.array(tcw_l), jnp.float32),
        points=jnp.asarray(cloud + rng.normal(0, 0.05, cloud.shape), jnp.float32),
    )
    return (state, np.concatenate(cams), np.concatenate(lms),
            np.concatenate(uvs).astype(np.float32))


def shard_slice(state, cam_idx, lm_idx, uv, n_shards, pad_obs):
    """Shard 0's slice of the landmark-sharded problem (what one chip of an
    n-chip mesh would compute per iteration)."""
    lm_per = L // n_shards
    sel = np.where(lm_idx < lm_per)[0]
    if len(sel) > pad_obs:
        sel = sel[:pad_obs]
    o_cam = np.zeros(pad_obs, np.int32)
    o_lm = np.zeros(pad_obs, np.int32)
    o_uv = np.zeros((pad_obs, 2), np.float32)
    o_val = np.zeros(pad_obs, bool)
    n = len(sel)
    o_cam[:n] = cam_idx[sel]
    o_lm[:n] = lm_idx[sel]
    o_uv[:n] = uv[sel]
    o_val[:n] = True
    obs = BAObservations(
        cam_idx=jnp.asarray(o_cam), lm_idx=jnp.asarray(o_lm),
        uv=jnp.asarray(o_uv), inv_sigma2=jnp.ones(pad_obs, jnp.float32),
        valid=jnp.asarray(o_val),
    )
    pts = jnp.asarray(np.asarray(state.points)[:lm_per])
    return obs, pts, n


def make_iter_fn(lm_per, n_obs):
    """One LM iteration's per-shard work: linearize + landmark blocks +
    RCS assembly + (local) solve + landmark back-substitution. Exactly the
    body of dist_ba._shard_lm_iters minus the collective."""
    @jax.jit
    def step(Rcw, tcw, pts, obs, lam):
        state = VisionBAState(Rcw=Rcw, tcw=tcw, points=pts)
        err, J_pose, J_point, w, _, _ = ba._linearize_vision(
            state, obs, CAM, robust=True
        )
        sys_ = schur.ObsSystem(
            J_c=J_pose, J_p=J_point, r=-err, w=w,
            cam_idx=obs.cam_idx, lm_idx=obs.lm_idx,
        )
        fixed = jnp.zeros(K, bool).at[0].set(True)
        S, b, H_ll_inv, b_l, B = schur.build_reduced_camera_system(
            sys_, K, lm_per, D, lam, fixed
        )
        dx = schur.solve_cameras(S, b, lam, jnp.repeat(fixed, D))
        dx_pts = schur.back_substitute_landmarks(
            B, obs.cam_idx, obs.lm_idx, H_ll_inv, b_l,
            dx.reshape(K, D), lm_per,
        )
        return dx, dx_pts

    return step


def timed(fn, args, reps=4):
    r = jax.block_until_ready(fn(*args))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best.append(time.perf_counter() - t0)
    best.sort()
    return best[len(best) // 2]


def comm_model(n, n_cg=96, bw=ICI_BW):
    nd = K * D
    bytes_psum = 2.0 * (n - 1) / n * nd * nd * 4
    bytes_pcg = nd * nd * 4 / n + n_cg * nd * 4 * 2.0 * (n - 1) / n
    return bytes_psum / bw, bytes_pcg / bw


# Sensitivity band over the assumed ICI bandwidth (round-4 VERDICT #9:
# the single 45 GB/s point carried its uncertainty dishonestly). 20 GB/s
# is a heavily-contended/derated link, 90 GB/s an optimistic v5e figure.
ICI_BW_BAND = (2.0e10, 4.5e10, 9.0e10)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    state, cam_idx, lm_idx, uv, = build_problem()
    n_obs_total = len(cam_idx)
    lam = jnp.asarray(1e-4, jnp.float32)

    shards = {}
    for n in (1, 2, 4, 8, 16):
        lm_per = L // n
        pad = int(np.ceil(n_obs_total / n / 1024)) * 1024 + 1024
        obs, pts, n_real = shard_slice(state, cam_idx, lm_idx, uv, n, pad)
        step = make_iter_fn(lm_per, pad)
        try:
            t = timed(step, (state.Rcw, state.tcw, pts, obs, lam))
        except Exception as e:  # single-chip HBM cannot hold the 1-shard slice
            print(f"n={n}: OOM on one chip ({type(e).__name__}) — "
                  "extrapolated from the linear-in-L/n fit below", flush=True)
            shards[n] = {"lm_per_shard": lm_per, "obs_per_shard": n_real,
                         "t_shard_s": None, "oom_on_single_chip": True}
            continue
        t_psum, t_pcg = comm_model(n)
        shards[n] = {
            "lm_per_shard": lm_per,
            "obs_per_shard": n_real,
            "t_shard_s": round(t, 4),
            "t_comm_psum_s": round(t_psum, 6),
            "t_comm_pcg_s": round(t_pcg, 6),
        }
        print(f"n={n}: per-shard iter {t*1e3:.1f} ms "
              f"(comm psum {t_psum*1e3:.2f} ms, pcg {t_pcg*1e3:.2f} ms)",
              flush=True)

    # per-shard cost is linear in L/n (the F fill-in matmul dominates);
    # extrapolate any OOM'd sizes from the measured points so the strong-
    # scaling baseline t(1) exists even when one chip cannot hold shard 1
    measured = {n: r for n, r in shards.items() if r.get("t_shard_s")}
    n_ref = min(measured)
    slope = measured[n_ref]["t_shard_s"] / shards[n_ref]["lm_per_shard"]
    for n, r in shards.items():
        if r.get("t_shard_s") is None:
            r["t_shard_s"] = round(slope * r["lm_per_shard"], 4)
            t_psum, t_pcg = comm_model(n)
            r["t_comm_psum_s"] = round(t_psum, 6)
            r["t_comm_pcg_s"] = round(t_pcg, 6)
            r["extrapolated"] = True
    t1 = shards[1]["t_shard_s"]
    for n, row in shards.items():
        eff_psum = t1 / (n * (row["t_shard_s"] + row["t_comm_psum_s"]))
        eff_pcg = t1 / (n * (row["t_shard_s"] + row["t_comm_pcg_s"]))
        row["projected_efficiency_psum"] = round(eff_psum, 3)
        row["projected_efficiency_pcg"] = round(eff_pcg, 3)
        # weak scaling: per-shard size fixed at L/n of the strong problem
        row["weak_efficiency_pcg"] = round(
            row["t_shard_s"] / (row["t_shard_s"] + row["t_comm_pcg_s"]), 3
        )
        # efficiency as a band over the ICI-bandwidth assumption
        row["efficiency_pcg_vs_ici_bw"] = {
            f"{bw/1e9:.0f}GBps": round(
                t1 / (n * (row["t_shard_s"] + comm_model(n, bw=bw)[1])), 3
            )
            for bw in ICI_BW_BAND
        }

    out = {
        "metric": f"distributed_ba_scaling_{tag}",
        "problem": {
            "K": K, "L": L, "n_obs": int(n_obs_total), "cam_dof": D,
            "scale_class": "config-4 (KITTI-00 global BA regime)",
        },
        "method": (
            "real-TPU per-shard LM-iteration timing at shard sizes L/n "
            "+ ICI communication model (see module docstring); this host "
            "has 2 physical CPU cores and 1 TPU chip, so a direct "
            "multi-device wall-clock measurement is not possible — "
            "correctness of the distributed execution is covered by "
            "tests/test_dist_ba.py (8 virtual devices, results match the "
            "single-device solver) and tests/test_multihost.py (2 "
            "processes over gloo)."
        ),
        "device": str(dev),
        "ici_bw_bytes_per_s": ICI_BW,
        "rcs_solver_variants": ["psum+replicated-cholesky", "reduce_scatter+pcg"],
        "shards": shards,
        "efficiency_8x_projected_psum": shards[8]["projected_efficiency_psum"],
        "efficiency_8x_projected_pcg": shards[8]["projected_efficiency_pcg"],
        "efficiency_band_note": (
            "efficiency_pcg_vs_ici_bw reports each shard count's projected "
            "efficiency across a 20-90 GB/s effective-ICI-bandwidth band "
            "instead of the single 45 GB/s assumption; the spread IS the "
            "model's uncertainty."
        ),
        "projection_disclaimer": (
            "Every multi-shard efficiency figure here is MODEL-PROJECTED "
            "(measured per-shard compute + analytic ICI communication), "
            "NOT a multi-chip wall-clock measurement — this host has one "
            "TPU chip. See measured_comm for the one real cross-process "
            "collective datapoint (gloo/DCN, the pessimistic fabric)."
        ),
        "round2_context": (
            "round-2 measured 0.097/0.074 efficiency on a K=24/L=16k window "
            "problem over timeshared virtual devices; at config-4 scale the "
            "per-shard Schur work is O(L/n * (K*D)^2) flops vs O((K*D)^2) "
            "bytes of communication, giving the projected efficiencies here."
        ),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    comm_path = os.path.join(repo, "COMM_GLOO.json")
    if os.path.exists(comm_path):
        # measured cross-process collective at the same RCS payload
        # (tools/measure_comm_gloo.py) — validates the comm model's math
        # on a real fabric; gloo/DCN is ~2 orders slower than the ICI
        # constant the projections assume
        with open(comm_path) as f:
            out["measured_comm"] = json.load(f)
    path = os.path.join(repo, f"SCALING_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
