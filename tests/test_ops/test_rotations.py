import numpy as np
import jax.numpy as jnp

from ipercore_tpu.ops.rotations import (
    rodrigues,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotmat_to_axis_angle,
    axis_angle_to_rot6d,
    rot6d_to_axis_angle,
    quat_to_rotmat,
)


def _random_aa(n, seed=0, scale=np.pi * 0.9):
    rng = np.random.RandomState(seed)
    axis = rng.randn(n, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.01, scale, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_rodrigues_orthonormal():
    aa = _random_aa(32)
    R = np.asarray(rodrigues(jnp.asarray(aa)))
    eye = np.eye(3)
    for r in R:
        np.testing.assert_allclose(r @ r.T, eye, atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_rodrigues_zero_angle_is_identity():
    R = np.asarray(rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)


def test_rodrigues_known_rotation():
    # 90 deg about z: x -> y
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(rodrigues(aa))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_aa_roundtrip_through_rotmat():
    aa = _random_aa(64, seed=1)
    R = rodrigues(jnp.asarray(aa))
    aa2 = np.asarray(rotmat_to_axis_angle(R))
    np.testing.assert_allclose(aa2, aa, atol=1e-4)


def test_rot6d_roundtrip():
    aa = _random_aa(64, seed=2)
    r6 = axis_angle_to_rot6d(jnp.asarray(aa))
    aa2 = np.asarray(rot6d_to_axis_angle(r6))
    np.testing.assert_allclose(aa2, aa, atol=1e-4)


def test_rot6d_to_rotmat_orthonormal_from_noise():
    rng = np.random.RandomState(3)
    x = rng.randn(16, 6).astype(np.float32)
    R = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_quat_identity():
    R = np.asarray(quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]])))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
