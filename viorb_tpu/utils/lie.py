"""Lie-group math for SO(3) / SE(3) / Sim(3), pure JAX, batch-friendly.

Functional equivalent of the reference's vendored Sophus SO3
(`/root/reference/src/IMU/so3.{h,cc}`) and g2o's SE3Quat / Sim3 types
(`/root/reference/Thirdparty/g2o/g2o/types/{se3quat.h,sim3.h}`), re-designed
as stateless array ops:

- every function operates on trailing axes and broadcasts over arbitrary
  leading batch axes, so the whole module vmaps/jits cleanly;
- rotations are stored as 3x3 matrices (``(..., 3, 3)``) in compute paths and
  as quaternions ``(..., 4)`` (w, x, y, z) for compact storage;
- Taylor expansions around theta=0 are used everywhere a division by theta
  appears, guarded with ``jnp.where`` so gradients stay finite.

All formulas are standard (Sophus / Barfoot "State Estimation for Robotics");
right-Jacobian conventions match the reference implementation
(`src/IMU/IMUPreintegrator.h:94-162`): for phi in so(3),

    exp(phi + dphi) ~= exp(phi) * exp(Jr(phi) dphi)
    Jr(phi)    = I - c1 [phi]x + c2 [phi]x^2
    JrInv(phi) = I + 0.5 [phi]x + c3 [phi]x^2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jax.Array) -> jax.Array:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _theta(phi: jax.Array) -> jax.Array:
    return jnp.linalg.norm(phi, axis=-1)


def _safe_theta(phi: jax.Array):
    """(theta2, small-mask, safe_theta) with NaN-free gradients at phi=0.

    Uses the double-`where` trick: the argument of sqrt/sin/cos is replaced
    by 1 inside the small-angle region so the unused branch's gradient stays
    finite (``jnp.where`` propagates NaN from both branches otherwise).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < _EPS * _EPS
    safe_theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return theta2, small, safe_theta


def so3_exp(phi: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3), Rodrigues with Taylor guard.

    (..., 3) -> (..., 3, 3).
    """
    theta2, small, theta = _safe_theta(phi)
    theta2 = theta2[..., None, None]
    small = small[..., None, None]
    theta = theta[..., None, None]
    K = hat(phi)
    K2 = K @ K
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    sin_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_t = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + sin_t * K + cos_t * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map SO(3) -> so(3) via quaternion (robust near pi).

    (..., 3, 3) -> (..., 3).
    """
    return quat_log(quat_from_matrix(R))


def so3_Jr(phi: jax.Array) -> jax.Array:
    """Right Jacobian of SO(3): Jr = I - c1*[phi]x + c2*[phi]x^2."""
    theta2, small, theta = _safe_theta(phi)
    theta2 = theta2[..., None, None]
    small = small[..., None, None]
    theta = theta[..., None, None]
    K = hat(phi)
    K2 = K @ K
    c1 = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    c2 = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta * theta * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - c1 * K + c2 * K2


def so3_Jr_inv(phi: jax.Array) -> jax.Array:
    """Inverse right Jacobian: JrInv = I + 0.5*[phi]x + c3*[phi]x^2."""
    theta2, small, theta = _safe_theta(phi)
    theta2 = theta2[..., None, None]
    small = small[..., None, None]
    theta = theta[..., None, None]
    K = hat(phi)
    K2 = K @ K
    # c3 = 1/theta^2 - (1+cos)/(2 theta sin); Taylor: 1/12 + theta^2/720
    c3 = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / (theta * theta) - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + 0.5 * K + c3 * K2


def so3_Jl(phi: jax.Array) -> jax.Array:
    """Left Jacobian: Jl(phi) = Jr(-phi)."""
    return so3_Jr(-phi)


def so3_Jl_inv(phi: jax.Array) -> jax.Array:
    return so3_Jr_inv(-phi)


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z), Hamilton convention.
# ----------------------------------------------------------------------------


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_exp(phi: jax.Array) -> jax.Array:
    """so(3) -> unit quaternion."""
    theta2, small, theta = _safe_theta(phi)
    theta2, small, theta = theta2[..., None], small[..., None], theta[..., None]
    half = 0.5 * jnp.where(small, 0.0, theta)
    s = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.cos(half)
    return jnp.concatenate([w, s * phi], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> so(3) rotation vector, range [0, pi]."""
    q = quat_normalize(q)
    # Force w >= 0 so the angle is in [0, pi].
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vnorm = jnp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < _EPS
    scale = jnp.where(small, 2.0 / jnp.where(w == 0, 1.0, w), theta / jnp.where(small, 1.0, vnorm))
    return scale[..., None] * q[..., 1:]


def quat_to_matrix(q: jax.Array) -> jax.Array:
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def quat_from_matrix(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w, x, y, z); branch-free Shepperd.

    Computes all four candidate solutions and selects the best-conditioned
    one with `jnp.where`, so it is safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    # Pivot selection: largest of (tr, m00, m11, m22).
    cand = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(cand, axis=-1)[..., None]
    q = jnp.where(idx == 0, q0, jnp.where(idx == 1, q1, jnp.where(idx == 2, q2, q3)))
    return quat_normalize(q)


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Re-orthonormalize a drifting rotation matrix via quaternion round-trip.

    Same trick as the reference's `IMUPreintegrator::normalizeRotationM`
    (`src/IMU/IMUPreintegrator.h:165-179`).
    """
    return quat_to_matrix(quat_from_matrix(R))


# ----------------------------------------------------------------------------
# SE(3): (R, t) tuples stored as (..., 3, 3) and (..., 3).
# ----------------------------------------------------------------------------


def se3_inv(R: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_mul(Ra, ta, Rb, tb) -> tuple[jax.Array, jax.Array]:
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R: jax.Array, t: jax.Array, p: jax.Array) -> jax.Array:
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """se(3) -> SE(3). xi = (rho, phi): translation part first, (..., 6)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_Jl(phi)
    return R, jnp.einsum("...ij,...j->...i", V, rho)


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    phi = so3_log(R)
    Vinv = so3_Jl_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


# ----------------------------------------------------------------------------
# Sim(3): (R, t, s). Used by loop closing (Sim3 solver + essential graph),
# mirroring g2o's sim3.h semantics: x -> s*R*x + t.
# ----------------------------------------------------------------------------


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    return (
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
        sa * sb,
    )


def sim3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """sim(3) -> Sim(3). xi = (rho, phi, sigma), (..., 7).

    Uses the standard closed form (Strasdat thesis): the translation is
    W(phi, sigma) @ rho where W generalizes the left Jacobian with the
    exponential scale factor.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta = _theta(phi)
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    # Coefficients A, B, C of W = C*I + A*K + B*K2 (Strasdat Sim3 exp).
    eps = _EPS
    th2 = theta * theta
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    safe_sig = jnp.where(sig_small, 1.0, sigma)
    safe_th = jnp.where(th_small, 1.0, theta)
    safe_th2 = jnp.where(th_small, 1.0, th2)

    C = jnp.where(sig_small, 1.0, (s - 1.0) / safe_sig)

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    # Both small: A -> 1/2, B -> 1/6
    a_both = 0.5
    b_both = 1.0 / 6.0
    # sigma small, theta not:
    a_sig0 = (1.0 - cos_t) / safe_th2
    b_sig0 = (theta - sin_t) / (safe_th2 * safe_th)
    # theta small, sigma not:
    a_th0 = ((sigma - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    b_th0 = (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / (safe_sig * safe_sig * safe_sig)
    # General:
    denom = safe_sig * safe_sig + safe_th2
    a_gen = (sigma * s * sin_t + (1.0 - s * cos_t) * theta) / (safe_th * denom)
    b_gen = (C - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / safe_th2

    A = jnp.where(sig_small & th_small, a_both, jnp.where(sig_small, a_sig0, jnp.where(th_small, a_th0, a_gen)))
    B = jnp.where(sig_small & th_small, b_both, jnp.where(sig_small, b_sig0, jnp.where(th_small, b_th0, b_gen)))

    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, s


def sim3_log(R: jax.Array, t: jax.Array, s: jax.Array) -> jax.Array:
    """Sim(3) -> sim(3) via solving W rho = t (W is 3x3, well-conditioned)."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Build W from (phi, sigma) with the same coefficients as sim3_exp, then
    # solve the 3x3 system W rho = t.
    theta = _theta(phi)
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), K.shape)
    eps = _EPS
    th2 = theta * theta
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    safe_sig = jnp.where(sig_small, 1.0, sigma)
    safe_th = jnp.where(th_small, 1.0, theta)
    safe_th2 = jnp.where(th_small, 1.0, th2)
    C = jnp.where(sig_small, 1.0, (s - 1.0) / safe_sig)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    a_sig0 = (1.0 - cos_t) / safe_th2
    b_sig0 = (theta - sin_t) / (safe_th2 * safe_th)
    a_th0 = ((sigma - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    b_th0 = (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / (safe_sig * safe_sig * safe_sig)
    denom = safe_sig * safe_sig + safe_th2
    a_gen = (sigma * s * sin_t + (1.0 - s * cos_t) * theta) / (safe_th * denom)
    b_gen = (C - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / safe_th2
    A = jnp.where(sig_small & th_small, 0.5, jnp.where(sig_small, a_sig0, jnp.where(th_small, a_th0, a_gen)))
    B = jnp.where(sig_small & th_small, 1.0 / 6.0, jnp.where(sig_small, b_sig0, jnp.where(th_small, b_th0, b_gen)))
    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * K2
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
