"""Shared, cached jitted kernel sets for the SLAM pipelines.

Every `MonoSystem`/`ViMonoSystem` instance used to create its own
`jax.jit`-wrapped lambdas in `__init__`. JAX's compile cache is keyed on
the *function object*, so a second instance with identical config recompiled
every stage from scratch — on the remote-tunnel TPU backend that is seconds
per program, and it made "warm up one system, time a fresh one" benchmarks
time compilation instead of work (round-2 ADVICE, medium finding).

This module owns the jitted kernels at module scope, memoized on the static
configuration (camera intrinsics, ORB parameters, distortion, image bounds,
mode flags — all hashable NamedTuples of floats). Two systems with the same
config share one compiled program per (kernel, input-shape) pair; different
capacities merely retrace for the new shapes under the same jit wrapper.

The reference has no analog — its stages are plain C++ calls; compilation
reuse is a JAX-specific concern.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from ..map import arrays as ma
from ..ops import matching, orb, undistort
from ..solver import pose as pose_opt
from ..solver import ba
from ..solver.ba import Camera
from . import initializer, local_mapping, tracking


@functools.lru_cache(maxsize=None)
def mono_kernels(
    cam: Camera,
    orb_params: orb.OrbParams,
    dist: undistort.DistCoeffs,
    bounds: tuple,  # (x_min, x_max, y_min, y_max) undistorted image bounds
    only_local: bool,
    stereo: bool,
) -> SimpleNamespace:
    """Jitted kernels for the vision pipeline (MonoSystem + subclasses)."""
    x_min, x_max, y_min, y_max = (float(b) for b in bounds)
    scale = orb_params.scale
    n_levels = orb_params.n_levels
    k = SimpleNamespace()

    k.extract = jax.jit(lambda im: orb.extract(im, orb_params))
    # initialization extractor: whole budget on level 0 (see MonoSystem)
    k.extract_ini = jax.jit(
        lambda im: orb.extract(im, orb_params._replace(n_levels=1))
    )
    k.undistort = jax.jit(
        lambda xy: undistort.undistort_points(
            xy, cam.fx, cam.fy, cam.cx, cam.cy, dist
        )
    )
    k.match_init = jax.jit(
        lambda f1, f2: matching.search_for_initialization(f1.feats, f2.feats)
    )
    k.initialize = jax.jit(
        lambda xy1, xy2, valid, key: initializer.initialize_two_view(
            xy1, xy2, valid, cam, key
        )
    )
    k.feat_count = jax.jit(lambda f: f.feats.valid.sum())
    k.split = jax.jit(lambda key: tuple(jax.random.split(key)))

    # the whole two-view bootstrap attempt as ONE program + ONE scalar
    # fetch per frame (match + H/F RANSAC + model select + reconstruction;
    # Tracking::MonocularInitialization, Tracking.cc:1616-1717). The old
    # host sequence interleaved eager reductions with fetches — on the
    # remote-TPU tunnel that cost ~1-3 s per NOT_INITIALIZED frame.
    def _init_attempt(f_prev, f_new, key):
        res = matching.search_for_initialization(f_prev.feats, f_new.feats)
        idx2 = jnp.clip(res.idx, 0)
        init = initializer.initialize_two_view(
            f_prev.xy_und, f_new.xy_und[idx2], res.valid, cam, key
        )
        scalars = jnp.stack([
            f_new.feats.valid.sum().astype(jnp.int32),
            res.valid.sum().astype(jnp.int32),
            init.success.astype(jnp.int32),
        ])
        return res, init, scalars

    k.init_attempt = jax.jit(_init_attempt)

    # covisibility counts vs one association row, fused (the eager
    # scatter that built lm_mask cost two remote round-trips per keyframe)
    def _covis_of_row(m, assoc_row):
        L = m.lms.pos.shape[0]
        lm_mask = jnp.zeros((L,), bool).at[jnp.clip(assoc_row, 0)].set(
            assoc_row >= 0
        )
        return ma.covisible_kf_counts(m, lm_mask)

    k.covis_of_row = jax.jit(_covis_of_row)

    # --- per-frame tracking ---
    # the whole per-frame sequence as ONE program (fused_frame_step): one
    # dispatch + one small scalar fetch per frame
    k.fused = jax.jit(
        lambda m, f, Rl, tl, al, ang, Rv, tv, rp, rk, mo: tracking.fused_frame_step(
            m, f, Rl, tl, al, ang, Rv, tv, rp, rk, mo, cam,
            x_max, y_max, x_min=x_min, y_min=y_min, only_local=only_local,
        )
    )
    # individual stages (used by tests, relocalization recovery, VI paths)
    k.track_mm = jax.jit(
        lambda m, f, Rl, tl, al, Rv, tv, ang: tracking.track_motion_model(
            m, f, Rl, tl, al, Rv, tv, cam, angle_last=ang
        )
    )
    k.track_ref_kf = jax.jit(
        lambda m, f, kf, R, t: tracking.track_reference_keyframe(
            m, f, kf, R, t, cam
        )
    )
    k.ref_tracked = jax.jit(tracking.ref_kf_tracked_landmarks)
    k.track_lm = jax.jit(
        lambda m, f, R, t, a: tracking.track_local_map(
            m, f, R, t, a, cam, x_max, y_max, x_min=x_min, y_min=y_min
        )
    )
    k.track_lm_wide = jax.jit(
        lambda m, f, R, t, a: tracking.track_local_map(
            m, f, R, t, a, cam, x_max, y_max, th=5.0, x_min=x_min, y_min=y_min
        )
    )

    # --- keyframe insertion (mapping stage) ---
    k.add_kf = jax.jit(ma.add_keyframe)
    k.covis = jax.jit(ma.covisible_kf_counts)
    # the whole CreateNewMapPoints + SearchInNeighbors + dedup + distinctive
    # descriptors + landmark-geometry + MapPointCulling sequence as ONE
    # program (round-2 VERDICT "amortize keyframe insertion")
    k.mapping_program = jax.jit(
        lambda m, new_id, nbs: local_mapping.keyframe_mapping_program(
            m, new_id, nbs, cam, x_max, y_max, x_min=x_min, y_min=y_min,
            scale=scale, n_levels=n_levels,
        )
    )
    # individual stages kept for tests / loop closing
    k.triangulate = jax.jit(
        lambda m, k1, k2: local_mapping.triangulate_new_points(
            m, k1, k2, cam, scale=scale, n_levels=n_levels
        )
    )
    k.fuse = jax.jit(
        lambda m, kf, cand: local_mapping.fuse_into_keyframe(
            m, kf, cand, cam, x_max, y_max, x_min=x_min, y_min=y_min,
            scale=scale,
        )
    )
    k.dedup = jax.jit(local_mapping.dedup_and_recount)
    k.distinct = jax.jit(local_mapping.compute_distinctive_descriptors)
    k.lm_mask_of = jax.jit(ma.landmarks_of_keyframes)
    k.local_ba = jax.jit(
        lambda m, ids, fixed: local_mapping.local_ba_vision(
            m, ids, fixed, cam, stereo=stereo
        )
    )
    k.cull = jax.jit(local_mapping.cull_landmarks)
    k.redundancy = jax.jit(local_mapping.keyframe_redundancy)
    # initial-map global BA (CreateInitialMapMonocular, 20 iters, first KF
    # fixed). MUST be jitted: the eager form compiles each fori_loop as a
    # standalone scan primitive, which XLA:CPU has segfaulted on at
    # image-e2e sizes (see .claude/skills/verify — "keep solver entry
    # points wrapped in jax.jit").
    k.init_ba = jax.jit(
        lambda state, obs, fixed: ba.bundle_adjust_vision(
            state, obs, cam, fixed, n_rounds=1, iters_per_round=(20,),
            robust_rounds=(True,),
        )
    )

    # --- device-side keyframe-insertion window selection ---
    # The old host path fetched the covisibility row (one ~27 ms tunnel
    # round trip per keyframe) before it could even dispatch the mapping
    # program; these two programs keep the whole neighbor / BA-window
    # choice on the device so insertion dispatches with ZERO fetches
    # (round-3 VERDICT item 4: overlap keyframe work with tracking).
    def _top_neighbors(counts, new_id):
        """Top-3 covisible neighbors (> 10 shared landmarks) for
        triangulation — the host selection in _triangulate_and_fuse."""
        c = counts.at[new_id].set(0)
        v, i = jax.lax.top_k(c, 3)
        return jnp.where(v > 10, i, -1).astype(jnp.int32)

    k.top_neighbors = jax.jit(_top_neighbors)

    def _ba_window(counts, kf_valid, free_ids, free_fixed, first_free,
                   n_extra, n_fixed):
        """Local-BA camera set: the host-known temporal free window (last
        W live keyframes, oldest fixed as gauge anchor) + up to `n_extra`
        strongly-covisible (weight >= 15, the covisibility-edge threshold,
        KeyFrame.cc:780) OLDER keyframes freed as well + the top `n_fixed`
        remaining covisible older keyframes, fixed
        (Optimizer::LocalBundleAdjustment's camera sets, Optimizer.cc:2763
        — the reference frees the whole covisible group; the n_extra slots
        are the fixed-shape approximation of that on revisits, where the
        covisible set includes last-pass keyframes whose frozen drift
        would otherwise bias everything the calibration LS consumes).
        A round-5 experiment freeing the FULL covisible group like the
        reference destabilized small maps (scale collapse: with nearly
        every camera free the gauge rests on keyframe 0 alone); the
        temporal anchor pattern is kept deliberately.

        When no older covisible keyframe exists, a second free camera is
        fixed to pin the mono scale gauge (scaling the world about a
        single fixed camera's center leaves reprojection unchanged)."""
        idx = jnp.arange(counts.shape[0])
        in_free = jnp.zeros(counts.shape[0], bool).at[
            jnp.clip(free_ids, 0)
        ].set(free_ids >= 0)
        # keyframe 0 is the gauge origin: never freed once it leaves the
        # temporal window (the reference's pKF->mnId != 0 exclusion)
        elig = (
            (idx < first_free) & (idx != 0) & kf_valid & (counts > 0)
            & ~in_free
        )
        score = jnp.where(elig, counts, 0)
        ve, ie = jax.lax.top_k(score, n_extra)
        extra_ids = jnp.where(ve >= 15, ie, -1).astype(jnp.int32)
        score2 = score.at[jnp.clip(ie, 0)].set(
            jnp.where(ve >= 15, 0, score[jnp.clip(ie, 0)])
        )
        v, i = jax.lax.top_k(score2, n_fixed)
        fixed_ids = jnp.where(v > 0, i, -1).astype(jnp.int32)
        has_fixed = (v[0] > 0) | (extra_ids[0] >= 0)
        nW = free_ids.shape[0]
        ff = free_fixed | ((jnp.arange(nW) == 1) & ~has_fixed & (free_ids >= 0))
        ids = jnp.concatenate([free_ids, extra_ids, fixed_ids])
        fixed = jnp.concatenate(
            [ff, extra_ids < 0, jnp.ones((int(n_fixed),), bool)]
        )
        return ids, fixed

    k.ba_window = jax.jit(_ba_window, static_argnames=("n_extra", "n_fixed"))
    k.cull_kf = jax.jit(local_mapping.cull_keyframe)
    k.lm_count = jax.jit(lambda m: m.lms.valid.sum())
    k.compact = jax.jit(ma.compact_keyframes)
    return k


@functools.lru_cache(maxsize=None)
def vi_kernels(cam: Camera, bounds: tuple) -> SimpleNamespace:
    """Jitted kernels specific to the VI pipeline (ViMonoSystem)."""
    x_min, x_max, y_min, y_max = (float(b) for b in bounds)
    k = SimpleNamespace()
    k.pose_kf = jax.jit(
        lambda ns, ns_kf, prob: pose_opt.pose_optimize_vi_kf(ns, ns_kf, prob, cam)
    )
    k.pose_frame = jax.jit(
        lambda ns, ns_l, prior, info, prob: pose_opt.pose_optimize_vi_frame(
            ns, ns_l, prior, info, prob, cam
        )
    )
    k.match_ref_kf = jax.jit(tracking.match_reference_keyframe)
    # one fused program per VI frame; vs_kf selects the optimizer variant
    # (two compiled programs, chosen by the host's bMapUpdated flag)
    from . import vi_system as vs

    k.fused_vs_kf = jax.jit(
        lambda m, f, imu, ns_base, Rl, tl, al, ang, grav, Rcb, pcb, bg, ba_,
        noise, pr_ns, pr_info, rp, rk, mo: vs.fused_vi_frame_step(
            m, f, imu, ns_base, Rl, tl, al, ang, grav, Rcb, pcb, bg, ba_,
            noise, pr_ns, pr_info, rp, rk, mo, cam,
            x_max, y_max, x_min=x_min, y_min=y_min, vs_kf=True,
        )
    )
    k.fused_vs_frame = jax.jit(
        lambda m, f, imu, ns_base, Rl, tl, al, ang, grav, Rcb, pcb, bg, ba_,
        noise, pr_ns, pr_info, rp, rk, mo: vs.fused_vi_frame_step(
            m, f, imu, ns_base, Rl, tl, al, ang, grav, Rcb, pcb, bg, ba_,
            noise, pr_ns, pr_info, rp, rk, mo, cam,
            x_max, y_max, x_min=x_min, y_min=y_min, vs_kf=False,
        )
    )

    def _vi_ba(state, obs, chain, Rcb, pcb, gravity, noise, fixed):
        return ba.bundle_adjust_vi(
            state, obs, chain, cam, Rcb, pcb, gravity, noise, fixed
        )

    k.vi_ba = jax.jit(_vi_ba)

    from ..ops import imu as imu_ops

    k.repreint = jax.jit(
        lambda g, a, d, bg, ba_, noise, mask: imu_ops.batch_preintegrate(
            g, a, d, bg, ba_, noise, mask
        )
    )

    # the whole VI local-BA stage (problem gather + window BA + writeback)
    # as ONE fixed-shape program: ids is the temporal window padded with -1
    # (one compiled shape for every window size, no eager gathers)
    def _vi_local_ba_program(m, ids, fixed, pre_tbl, Rcb, pcb, gravity, noise):
        from ..map import arrays as ma_

        Wtot = ids.shape[0]
        ids_c = jnp.clip(ids, 0)
        alive = ids >= 0
        obs = local_mapping.gather_ba_problem(m, ids, cam)
        # landmark compaction: run the Schur landmark algebra at the
        # window's active-landmark count, not the full table size
        # (local_mapping.compact_window_landmarks)
        L = m.lms.pos.shape[0]
        # cap = window size x feature budget (the maximum possible distinct
        # landmark count — truncation structurally impossible), bounded by
        # the table size (round-4 ADVICE low #5: the former hardcoded 4096
        # was a silent accuracy cliff for larger feature budgets)
        La = min(ids.shape[0] * m.assoc.shape[1], L)
        obs, act, keep, n_active = local_mapping.compact_window_landmarks(
            obs, L, La
        )
        act_c = jnp.clip(act, 0, L - 1)
        nav = jax.tree.map(lambda a: a[ids_c], m.kfs.nav)
        state = ba.VIBAState(nav=nav, points=m.lms.pos[act_c])
        chain = ba.ImuChain(
            i_idx=jnp.arange(Wtot - 1),
            j_idx=jnp.arange(1, Wtot),
            pre=jax.tree.map(lambda a: a[jnp.clip(ids[1:], 0)], pre_tbl),
            valid=alive[:-1] & alive[1:],
        )
        out, obs2 = ba.bundle_adjust_vi(
            state, obs, chain, cam, Rcb, pcb, gravity, noise,
            fixed | ~alive,
        )
        sel = lambda new, old: jnp.where(
            alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        nav_new = jax.tree.map(
            lambda full, new: full.at[ids_c].set(sel(new, full[ids_c])),
            m.kfs.nav, out.nav,
        )
        Rcw_w = Rcb @ jnp.swapaxes(out.nav.R, -1, -2)
        tcw_w = -jnp.einsum("...ij,...j->...i", Rcw_w, out.nav.p) + pcb
        kfs = m.kfs._replace(
            nav=nav_new,
            Rcw=m.kfs.Rcw.at[ids_c].set(sel(Rcw_w, m.kfs.Rcw[ids_c])),
            tcw=m.kfs.tcw.at[ids_c].set(sel(tcw_w, m.kfs.tcw[ids_c])),
        )
        N = m.assoc.shape[1]
        gated = obs.valid & ~obs2.valid
        assoc = m.assoc.at[
            jnp.repeat(ids_c, N), jnp.tile(jnp.arange(N), Wtot)
        ].set(jnp.where(gated, -1, m.assoc[ids_c].reshape(-1)))
        pos = m.lms.pos.at[act_c].set(
            jnp.where(keep[:, None], out.points, m.lms.pos[act_c])
        )
        return m._replace(
            kfs=kfs, lms=m.lms._replace(pos=pos), assoc=assoc
        ), n_active

    k.vi_local_ba = jax.jit(_vi_local_ba_program)

    # ------------------------------------------------------------------
    # VIO-initialization attempt as ONE fixed-shape program. The eager
    # per-attempt chain (gyro-bias GN -> re-preintegrate -> scale/gravity
    # LS -> refinement LS -> NavState assignment) ran ~35 small ops whose
    # shapes depended on the keyframe count N — each fresh N recompiled
    # them all (~0.35 s/op on the remote-TPU tunnel; a successful attempt
    # cost 13 s in round-4 profiling). Here everything runs at the full
    # table shape with validity masks; N is a traced scalar.
    # ------------------------------------------------------------------
    from . import vio_init
    from ..utils import lie as lie_ops

    def _prep(Rcw_t, tcw_t, g, a, d, smask, n, noise):
        K = Rcw_t.shape[0]
        Rwc = jnp.swapaxes(Rcw_t, -1, -2)
        pwc = -jnp.einsum("nji,nj->ni", Rcw_t, tcw_t)
        kf_mask = jnp.arange(K) < n
        pair = kf_mask[:-1] & kf_mask[1:]
        trip = kf_mask[:-2] & kf_mask[1:-1] & kf_mask[2:]
        z3 = jnp.zeros(3, Rcw_t.dtype)

        def preint(bg, ba_):
            return imu_ops.batch_preintegrate(g, a, d, bg, ba_, noise, smask)

        return Rwc, pwc, pair, trip, z3, preint

    def _init_attempt_fixed(Rcw_t, tcw_t, g, a, d, smask, n, Rcb, pcb,
                            noise, G):
        """Fixed-Tbc attempt (TryInitVIO, LocalMapping.cc:995-1419)."""
        Rwc, pwc, pair, trip, z3, preint = _prep(
            Rcw_t, tcw_t, g, a, d, smask, n, noise
        )
        pre0 = preint(z3, z3)
        bg = vio_init.estimate_gyro_bias(Rwc, pre0, Rcb, pair_mask=pair)
        pre1 = preint(bg, z3)
        s_star, gw_star = vio_init.estimate_scale_gravity(
            pwc, Rwc, pre1, Rcb, pcb, triplet_mask=trip
        )
        s, gw, ba_est = vio_init.refine_scale_gravity_ba(
            pwc, Rwc, pre1, Rcb, pcb, gw_star, G=G, triplet_mask=trip
        )
        pre2 = preint(bg, ba_est)
        ns_all = vio_init.navstates_from_vision(
            pwc, Rwc, pre2, s, gw, Rcb, pcb, bg, ba_est, n_valid=n
        )
        return dict(bg=bg, s_star=s_star, gw_star=gw_star, s=s, gw=gw,
                    ba=ba_est, ns=ns_all, pre=pre2, pre0=pre0)

    k.init_attempt_fixed = jax.jit(_init_attempt_fixed, static_argnames=("G",))

    def _init_attempt_calib(Rcw_t, tcw_t, g, a, d, smask, n, noise, G,
                            q_prev, sgp_prev, ref_prev):
        """Online-calibration attempt (TryInitVIOWithoutPreCalibration,
        LocalMapping.cc:102-987). prev-state args are None on the first
        attempt (static: two compiled variants)."""
        Rwc, pwc, pair, trip, z3, preint = _prep(
            Rcw_t, tcw_t, g, a, d, smask, n, noise
        )
        pre0 = preint(z3, z3)
        q = vio_init.estimate_rcb(Rwc, pre0, q_prev=q_prev, pair_mask=pair)
        Rcb = lie_ops.quat_to_matrix(q)
        bg = vio_init.estimate_gyro_bias(Rwc, pre0, Rcb, pair_mask=pair)
        pre1 = preint(bg, z3)
        s_star, gw_star, pcb_star = vio_init.estimate_scale_gravity_pcb(
            pwc, Rwc, pre1, Rcb, prev=sgp_prev, triplet_mask=trip
        )
        s, dtheta, ba_est, pcb, gw = vio_init.refine_with_pcb(
            pwc, Rwc, pre1, Rcb, gw_star, prev=ref_prev, G=G,
            triplet_mask=trip,
        )
        pre2 = preint(bg, ba_est)
        ns_all = vio_init.navstates_from_vision(
            pwc, Rwc, pre2, s, gw, Rcb, pcb, bg, ba_est, n_valid=n
        )
        return dict(q=q, Rcb=Rcb, bg=bg, s_star=s_star, gw_star=gw_star,
                    pcb_star=pcb_star, s=s, dtheta=dtheta, ba=ba_est,
                    pcb=pcb, gw=gw, ns=ns_all, pre=pre2, pre0=pre0)

    k.init_attempt_calib = jax.jit(
        _init_attempt_calib, static_argnames=("G",)
    )

    def _apply_init(m, ns_all, n, s):
        """Success tail: write the first n NavStates and rescale the map
        (Map::UpdateScale) — fixed shape, one dispatch."""
        from ..map import arrays as ma_

        K = m.kfs.valid.shape[0]
        alive = jnp.arange(K) < n
        nav = jax.tree.map(
            lambda full, new: jnp.where(
                alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, full
            ),
            m.kfs.nav, ns_all,
        )
        m = m._replace(kfs=m.kfs._replace(nav=nav))
        return ma_.update_scale(m, s)

    k.apply_init = jax.jit(_apply_init)
    return k
