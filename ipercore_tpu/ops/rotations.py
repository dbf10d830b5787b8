"""Rotation representation conversions (axis-angle, rotation matrix, rot6d, quaternion).

Functional JAX equivalents of the reference's torch utilities
(`iPERCore/tools/utils/geometry/rotations.py` and the Rodrigues path of
`iPERCore/tools/human_digitalizer/bodynets/batch_smpl.py:72`), written for XLA:
no data-dependent control flow, broadcast-friendly, f32 by default.

All functions operate on the trailing axes and may be freely vmapped/jitted.
"""
from __future__ import annotations

import jax.numpy as jnp


def rodrigues(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors to rotation matrices.

    Args:
        axis_angle: (..., 3) rotation in axis-angle form (direction * angle).

    Returns:
        (..., 3, 3) rotation matrices.
    """
    aa = jnp.asarray(axis_angle)
    # Gradient-safe norm: d|x|/dx = x/|x| is 0/0 at x=0 (jnp.linalg.norm
    # NaNs there); sqrt(x^2 + eps^2) keeps the value within 5e-13 for any
    # angle > 1e-4 and has a clean zero gradient at the origin.
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(sq + 1e-16)  # (..., 1), >= 1e-8
    axis = aa / angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    # Cross-product (hat) matrix of the unit axis.
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    a = angle[..., None]  # (..., 1, 1)
    sin_a = jnp.sin(a)
    cos_a = jnp.cos(a)
    eye = jnp.eye(3, dtype=aa.dtype)
    R = eye + sin_a * K + (1.0 - cos_a) * (K @ K)
    # For tiny angles fall back to first-order I + hat(aa) to avoid axis blowup.
    K_raw = K * angle[..., None]  # hat(aa)
    R_small = eye + K_raw
    use_small = (angle[..., None] < 1e-6)
    return jnp.where(use_small, R_small, R)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices to the continuous 6D representation (first two columns).

    Args:
        R: (..., 3, 3)

    Returns:
        (..., 6) — columns 0 and 1 of R, concatenated.
    """
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation to rotation matrices via Gram-Schmidt.

    Args:
        x: (..., 6)

    Returns:
        (..., 3, 3)
    """
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices to axis-angle vectors.

    Args:
        R: (..., 3, 3)

    Returns:
        (..., 3)
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_a = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_a)  # [0, pi] — branch predicates only (exact)
    # Gradient-safe angle for the generic branch: arccos'(x) = -1/sqrt(1-x^2)
    # blows up at |x| = 1 and jnp.where does NOT block NaN cotangents from
    # untaken branches (this made every optimization through identity
    # rotations NaN — e.g. SMPLify on poses with zero joints).
    cos_safe = jnp.clip(cos_a, -1.0 + 1e-7, 1.0 - 1e-7)
    angle_safe = jnp.arccos(cos_safe)
    # Off-diagonal antisymmetric part gives sin(angle) * axis.
    rx = R[..., 2, 1] - R[..., 1, 2]
    ry = R[..., 0, 2] - R[..., 2, 0]
    rz = R[..., 1, 0] - R[..., 0, 1]
    r = jnp.stack([rx, ry, rz], axis=-1)  # = 2 sin(angle) * axis
    sin_a = jnp.sin(angle_safe)
    # Generic case.
    axis_generic = r / jnp.maximum(2.0 * sin_a[..., None], 1e-8)
    # angle ~ pi: axis from diagonal of (R + I)/2 = axis axis^T.
    diag = jnp.stack(
        [R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1
    )
    val = jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0)
    # sqrt'(0) = inf: zero the component instead (double-where)
    val_safe = jnp.where(val < 1e-12, 1.0, val)
    axis_pi = jnp.where(val < 1e-12, 0.0, jnp.sqrt(val_safe))
    # Fix signs using the off-diagonal sums (sign ambiguity is global; pick rz>=0 style).
    sign = jnp.where(r >= 0, 1.0, -1.0)
    axis_pi = axis_pi * sign
    near_pi = (jnp.pi - angle) < 1e-3
    axis = jnp.where(near_pi[..., None], axis_pi, axis_generic)
    # angle ~ 0: r itself is the best small-angle estimate (r/2 ~ aa).
    near_zero = angle < 1e-6
    aa = jnp.where(near_zero[..., None], r * 0.5, axis * angle_safe[..., None])
    return aa


def axis_angle_to_rot6d(aa: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 6) rot6d. Used by the temporal SMPL smoother."""
    return rotmat_to_rot6d(rodrigues(aa))


def rot6d_to_axis_angle(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) rot6d -> (..., 3) axis-angle."""
    return rotmat_to_axis_angle(rot6d_to_rotmat(x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions (w, x, y, z) to rotation matrices.

    Args:
        q: (..., 4)

    Returns:
        (..., 3, 3)
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return R
