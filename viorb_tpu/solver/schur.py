"""Schur-complement normal equations for bundle adjustment, dense TPU form.

Replaces g2o's BlockSolver + LinearSolverCholmod
(`/root/reference/Thirdparty/g2o/g2o/core/block_solver.h`, used with
landmark marginalization at `src/Optimizer.cc:1230,1863,2407`) with a
batched, fixed-shape pipeline:

  1. every observation contributes a (D,2)x(2,3) Jacobian pair (camera,
     landmark) evaluated in batch;
  2. landmark blocks H_ll (3x3) are inverted in batch;
  3. the reduced camera system S = H_cc - W H_ll^-1 W^T is assembled
     *densely* via a square-root trick: with C_o = J_c^T w J_p chol(H_ll^-1)
     per observation, the fill-in is F F^T where F stacks per-landmark sums
     — one scatter-add plus one big matmul (MXU-shaped);
  4. S (+ camera-camera factor blocks from IMU/bias/prior edges, + LM
     damping) is solved with dense Cholesky; landmark updates are
     back-substituted in batch.

Shapes: K cameras x D dof, L landmarks, O observations (padded; `valid`
masks padding). K*D is a few hundred for the reference's windows — dense
Cholesky on TPU is microseconds; the expensive parts are the batched
Jacobian products, which are exactly MXU food.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ObsSystem(NamedTuple):
    """Per-observation linearized system (padded to fixed O)."""

    J_c: jax.Array  # (O, 2, D) Jacobian w.r.t. its camera
    J_p: jax.Array  # (O, 2, 3) Jacobian w.r.t. its landmark
    r: jax.Array  # (O, 2) residual
    w: jax.Array  # (O,) total weight (information * huber * valid)
    cam_idx: jax.Array  # (O,) int
    lm_idx: jax.Array  # (O,) int


def build_landmark_blocks(sys: ObsSystem, num_landmarks: int, damping: jax.Array):
    """H_ll (L,3,3) with LM damping, b_l (L,3)."""
    JtJ = jnp.einsum("oki,o,okj->oij", sys.J_p, sys.w, sys.J_p)
    Jtr = jnp.einsum("oki,o,ok->oi", sys.J_p, sys.w, sys.r)
    H_ll = jnp.zeros((num_landmarks, 3, 3), sys.J_p.dtype).at[sys.lm_idx].add(JtJ)
    b_l = jnp.zeros((num_landmarks, 3), sys.J_p.dtype).at[sys.lm_idx].add(Jtr)
    # Levenberg damping on the landmark blocks (additive, as in g2o's
    # OptimizationAlgorithmLevenberg which scales the diagonal).
    H_ll = H_ll + damping * jnp.eye(3, dtype=H_ll.dtype)
    return H_ll, b_l


def _chol_inv_3x3(H_ll: jax.Array):
    """Batched inverse and inverse-sqrt factor of (L,3,3) SPD blocks.

    Returns (H_inv, G) with G G^T = H^-1 (G = L^-T from the Cholesky
    H = L L^T). Closed form instead of `jnp.linalg.cholesky` +
    `solve_triangular`: XLA's generic batched path costs ~6 ms per LM
    iteration at L=16k on a v5e chip (round-4 profiling) while the
    explicit 3x3 factorization is a handful of fused elementwise ops.
    Empty landmark blocks (all-zero) are guarded by the damping added in
    `build_landmark_blocks`.
    """
    a = H_ll[..., 0, 0]
    b = H_ll[..., 1, 0]
    c = H_ll[..., 2, 0]
    d = H_ll[..., 1, 1]
    e = H_ll[..., 2, 1]
    f = H_ll[..., 2, 2]
    eps = jnp.asarray(1e-30, H_ll.dtype)
    l11 = jnp.sqrt(jnp.maximum(a, eps))
    l21 = b / l11
    l31 = c / l11
    l22 = jnp.sqrt(jnp.maximum(d - l21 * l21, eps))
    l32 = (e - l21 * l31) / l22
    l33 = jnp.sqrt(jnp.maximum(f - l31 * l31 - l32 * l32, eps))
    # Linv (lower): rows from forward substitution of L x = e_i
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    i32 = -l32 * i22 * i33
    z = jnp.zeros_like(a)
    Linv = jnp.stack(
        [
            jnp.stack([i11, z, z], -1),
            jnp.stack([i21, i22, z], -1),
            jnp.stack([i31, i32, i33], -1),
        ],
        -2,
    )
    G = jnp.swapaxes(Linv, -1, -2)  # G G^T = H^-1
    H_inv = G @ Linv
    return H_inv, G


def build_reduced_camera_system(
    sys: ObsSystem,
    num_cameras: int,
    num_landmarks: int,
    cam_dof: int,
    damping: jax.Array,
    fixed_cam_mask: jax.Array | None = None,
):
    """Assemble the Schur-reduced camera system.

    Returns (S, b_c, H_ll_inv, b_l):
      S: (K*D, K*D) reduced camera matrix (undamped on camera blocks —
         caller adds camera damping and extra factor blocks before solving)
      b_c: (K*D,) reduced rhs
      H_ll_inv: (L, 3, 3), b_l: (L, 3) for landmark back-substitution.

    fixed_cam_mask (K,) True for cameras held constant: their Jacobians are
    zeroed (g2o setFixed), so they contribute only through landmark blocks.
    """
    D = cam_dof
    w = sys.w
    J_c = sys.J_c
    if fixed_cam_mask is not None:
        free = jnp.logical_not(fixed_cam_mask)[sys.cam_idx]
        J_c = J_c * free[:, None, None]

    # Camera diagonal blocks H_cc and rhs b_c.
    JcTJc = jnp.einsum("oki,o,okj->oij", J_c, w, J_c)  # (O, D, D)
    JcTr = jnp.einsum("oki,o,ok->oi", J_c, w, sys.r)  # (O, D)
    H_cc = jnp.zeros((num_cameras, D, D), J_c.dtype).at[sys.cam_idx].add(JcTJc)
    b_c = jnp.zeros((num_cameras, D), J_c.dtype).at[sys.cam_idx].add(JcTr)

    # Landmark blocks and their inverse factors.
    H_ll, b_l = build_landmark_blocks(sys, num_landmarks, damping)
    H_ll_inv, G = _chol_inv_3x3(H_ll)

    # Per-observation camera-landmark coupling B_o = J_c^T w J_p  (D,3).
    B = jnp.einsum("oki,o,okj->oij", J_c, w, sys.J_p)  # (O, D, 3)

    # Square-root fill-in: C_o = B_o G_{l(o)};  F_l = sum_{o in l} scattered
    # into (L, K, D, 3);  S_fill = sum_l F_l F_l^T.
    C = B @ G[sys.lm_idx]  # (O, D, 3)
    F = jnp.zeros((num_landmarks, num_cameras, D, 3), J_c.dtype)
    F = F.at[sys.lm_idx, sys.cam_idx].add(C)
    S_fill = jnp.einsum("lkdc,lmec->kdme", F, F)  # (K, D, K, D)

    # Reduced rhs: b_c - W H_ll^-1 b_l, with (W y)_c = sum_{o} B_o y_{l(o)}.
    y = jnp.einsum("lij,lj->li", H_ll_inv, b_l)  # (L, 3)
    Wy = jnp.einsum("oij,oj->oi", B, y[sys.lm_idx])  # (O, D)
    b_red = b_c - jnp.zeros_like(b_c).at[sys.cam_idx].add(Wy)

    S = jnp.zeros((num_cameras, D, num_cameras, D), J_c.dtype)
    S = S.at[jnp.arange(num_cameras), :, jnp.arange(num_cameras), :].add(H_cc)
    S = S - S_fill
    S = S.reshape(num_cameras * D, num_cameras * D)
    b_red = b_red.reshape(num_cameras * D)
    return S, b_red, H_ll_inv, b_l, B


def solve_cameras(
    S: jax.Array,
    b: jax.Array,
    damping: jax.Array,
    fixed_dof_mask: jax.Array | None = None,
):
    """Solve (S + damping I) dx = b with fixed dofs pinned to zero.

    Fixed dofs: rows/cols replaced by identity, rhs zeroed — keeps the
    system SPD and the update exactly zero for fixed cameras.
    """
    n = S.shape[0]
    eye = jnp.eye(n, dtype=S.dtype)
    A = S + damping * eye
    if fixed_dof_mask is not None:
        free = jnp.logical_not(fixed_dof_mask).astype(S.dtype)
        A = A * free[:, None] * free[None, :] + eye * fixed_dof_mask.astype(S.dtype)
        b = b * free
    # Cholesky solve; fall back is unnecessary because damping > 0.
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return dx


def back_substitute_landmarks(
    sys_B: jax.Array,  # (O, D, 3) coupling blocks from build_reduced_camera_system
    cam_idx: jax.Array,
    lm_idx: jax.Array,
    H_ll_inv: jax.Array,
    b_l: jax.Array,
    dx_cam: jax.Array,  # (K, D)
    num_landmarks: int,
):
    """dx_l = H_ll^-1 (b_l - W^T dx_c), batched over landmarks."""
    Wt_dx = jnp.einsum("oij,oi->oj", sys_B, dx_cam[cam_idx])  # (O, 3)
    rhs = b_l - jnp.zeros((num_landmarks, 3), b_l.dtype).at[lm_idx].add(Wt_dx)
    return jnp.einsum("lij,lj->li", H_ll_inv, rhs)
