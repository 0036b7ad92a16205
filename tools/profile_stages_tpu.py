"""Steady-state DEVICE time of every per-keyframe program at bench shapes.

The bench's `decision_fetch` stall (~100 ms/flush, round-4 VERDICT #3b) is
a device_get that waits on whatever device compute is still queued — the
stage timers around dispatch sites measure host dispatch, NOT device time.
This script times each per-KF program to completion (block_until_ready) at
the bench's exact capacities (K=128, L=16384, N=1000), so the queue time a
flush can be stuck behind is attributable per program.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_tpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from viorb_tpu.map import arrays as ma
from viorb_tpu.io import synthetic
from viorb_tpu.pipeline.system import MonoSystem
from viorb_tpu.pipeline import loop_closing
from viorb_tpu.solver.ba import Camera

K, L, N = 128, 16384, 1000
W, H = 640, 480
CAM = Camera(fx=320.0, fy=320.0, cx=320.0, cy=240.0)


def build_populated_system(n_kfs=14):
    cap = ma.Capacities(max_kfs=K, max_lms=L, n_feat=N)
    sys_ = MonoSystem(CAM, W, H, cap=cap, decision_lag=6)
    rng = np.random.default_rng(0)
    cloud = synthetic.landmark_cloud(rng, n=L // 2)
    traj = synthetic.circle_trajectory(duration=8.0, imu_rate=20.0)
    ext = synthetic.euroc_like_extrinsics()
    bits = rng.integers(0, 2, (len(cloud), 256)).astype(bool)

    m = ma.empty_map(cap)
    idx = np.linspace(0, len(traj.t) - 1, n_kfs).astype(int)
    from viorb_tpu.ops.orb import OrbFeatures

    lm_used = 0
    inv = np.full(len(cloud), -1, np.int64)
    for ki, k in enumerate(idx):
        Rcw = (traj.Rwb[k] @ ext.Rbc).T
        tcw = -Rcw @ (traj.p[k] + traj.Rwb[k] @ ext.pbc)
        Pc = cloud @ Rcw.T + tcw
        uv = np.stack(
            [CAM.fx * Pc[:, 0] / np.maximum(Pc[:, 2], 1e-6) + CAM.cx,
             CAM.fy * Pc[:, 1] / np.maximum(Pc[:, 2], 1e-6) + CAM.cy], -1)
        vis = (Pc[:, 2] > 0.5) & (uv[:, 0] >= 1) & (uv[:, 0] < W - 1) \
            & (uv[:, 1] >= 1) & (uv[:, 1] < H - 1)
        sel = np.where(vis)[0][:N]
        n_s = len(sel)
        # register unseen landmarks
        fresh = sel[inv[sel] < 0]
        take = fresh[: max(0, L - 8 - lm_used)]
        inv[take] = lm_used + np.arange(len(take))
        lm_used += len(take)

        assoc = np.full(N, -1, np.int64)
        assoc[:n_s] = inv[sel]
        uvp = np.zeros((N, 2), np.float32)
        uvp[:n_s] = uv[sel]
        pm1 = np.zeros((N, 256), np.int8)
        pm1[:n_s] = np.where(bits[sel], 1, -1)
        valid = np.zeros(N, bool)
        valid[:n_s] = True
        packed = ((pm1.reshape(N, 32, 8) > 0)
                  * (2 ** np.arange(8, dtype=np.uint32))).sum(-1).astype(np.uint8)
        feats = OrbFeatures(
            xy=jnp.asarray(uvp),
            response=jnp.asarray(valid, jnp.float32) * 10.0,
            octave=jnp.zeros(N, jnp.int32),
            angle=jnp.zeros(N, jnp.float32),
            sigma2=jnp.ones(N, jnp.float32),
            desc=jnp.asarray(packed),
            desc_pm1=jnp.asarray(pm1),
            valid=jnp.asarray(valid),
        )
        m = sys_._add_kf(m, jnp.asarray(Rcw, jnp.float32),
                         jnp.asarray(tcw, jnp.float32), feats,
                         feats.xy, float(traj.t[k]), jnp.asarray(assoc))
        sys_._register_kf_host(ki, float(traj.t[k]))

    d0 = np.linalg.norm(cloud - traj.p[0][None], axis=-1)
    order = np.where(inv >= 0)[0]
    lms = m.lms._replace(
        pos=m.lms.pos.at[inv[order]].set(jnp.asarray(cloud[order], m.lms.pos.dtype)),
        pm1=m.lms.pm1.at[inv[order]].set(
            jnp.asarray(np.where(bits[order], 1, -1), jnp.int8)),
        dist_min=m.lms.dist_min.at[inv[order]].set(
            jnp.asarray(d0[order] / 1.2**7, m.lms.dist_min.dtype)),
        dist_max=m.lms.dist_max.at[inv[order]].set(
            jnp.asarray(d0[order] * 1.2, m.lms.dist_max.dtype)),
        n_obs=m.lms.n_obs.at[inv[order]].set(3),
        valid=m.lms.valid.at[inv[order]].set(True),
    )
    m = m._replace(lms=lms)
    m = ma.update_landmark_geometry(m, jnp.arange(L))
    sys_.map = m
    sys_._n_lms_cache = lm_used
    for ki in range(n_kfs):
        sys_.kf_index.add(ki, m.kfs.feat_pm1[ki], m.kfs.feat_valid[ki])
    return sys_, m, n_kfs


def timed(label, fn, reps=6):
    r = jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:28s} {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)
    return r


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    sys_, m, n_kfs = build_populated_system()
    new_id = n_kfs - 1
    assoc_row = m.assoc[new_id]

    counts = sys_._k.covis_of_row(m, assoc_row)
    nbs = sys_._k.top_neighbors(counts, jnp.asarray(new_id, jnp.int32))

    timed("covis_of_row", lambda: sys_._k.covis_of_row(m, assoc_row))
    timed("top_neighbors", lambda: sys_._k.top_neighbors(counts, jnp.asarray(new_id, jnp.int32)))
    timed("mapping_program",
          lambda: sys_._k.mapping_program(m, jnp.asarray(new_id, jnp.int32), nbs))

    kf_valid = sys_._kf_valid_cache
    n_tot = new_id + 1
    live = [i for i in range(n_tot) if kf_valid[i]]
    Wn = sys_.local_window
    W_free = min(Wn, len(live))
    free_ids = live[-W_free:] + [-1] * (Wn - W_free)
    free_fixed = [True] + [False] * (W_free - 1) + [True] * (Wn - W_free)
    ids, fixed = sys_._k.ba_window(
        counts, jnp.asarray(kf_valid), jnp.asarray(free_ids, jnp.int32),
        jnp.asarray(free_fixed), jnp.asarray(free_ids[0], jnp.int32),
        n_fixed=sys_.fixed_window,
    )
    jax.block_until_ready((ids, fixed))
    timed("local_ba", lambda: sys_._local_ba(m, ids, fixed))
    timed("redundancy", lambda: sys_._k.redundancy(m))
    timed("lm_count", lambda: sys_._k.lm_count(m))
    vectors = sys_.loop_closer.index.vectors
    timed("detect_program",
          lambda: loop_closing._detect_program(m, vectors, jnp.asarray(new_id, jnp.int32)))
    kern = loop_closing._sim3_kernel(CAM, False)
    timed("sim3_program",
          lambda: kern(m, jnp.asarray(new_id, jnp.int32),
                       jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0)))

    # one whole-KF-insertion device chain, as the flush would queue it
    def chain():
        mm = sys_._k.mapping_program(m, jnp.asarray(new_id, jnp.int32), nbs)
        mm, _na = sys_._local_ba(mm, ids, fixed)
        return sys_._k.redundancy(mm)

    timed("kf_chain(map+ba+red)", chain)


if __name__ == "__main__":
    main()
