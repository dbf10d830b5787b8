import numpy as np
import jax
import jax.numpy as jnp

from ipercore_tpu.models import smpl


def test_synthetic_model_cardinalities():
    m = smpl.synthetic_model()
    assert m.v_template.shape == (6890, 3)
    assert m.faces.shape == (13776, 3)
    assert m.j_regressor.shape == (24, 6890)
    assert m.lbs_weights.shape == (6890, 24)
    # closed mesh: every edge shared by exactly 2 faces
    f = np.asarray(m.faces)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_zero_pose_zero_shape_recovers_template():
    m = smpl.synthetic_model()
    verts, joints = smpl.lbs(m, jnp.zeros(10), jnp.zeros(72))
    np.testing.assert_allclose(np.asarray(verts), np.asarray(m.v_template), atol=1e-4)


def test_global_rotation_rotates_everything():
    m = smpl.synthetic_model()
    pose = jnp.zeros(72).at[2].set(np.pi / 2)  # global z rotation
    verts, _ = smpl.lbs(m, jnp.zeros(10), pose)
    ref, _ = smpl.lbs(m, jnp.zeros(10), jnp.zeros(72))
    c, s = 0.0, 1.0
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    # rotation is about the root joint
    root = np.asarray(m.j_regressor[0] @ np.asarray(m.v_template))
    expect = (np.asarray(ref) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts), expect, atol=1e-3)


def test_get_details_shapes_and_jit():
    m = smpl.synthetic_model()
    theta = jnp.zeros((4, 85)).at[:, 0].set(1.0)
    details = jax.jit(lambda t: smpl.get_details(m, t))(theta)
    assert details["verts"].shape == (4, 6890, 3)
    assert details["j2d"].shape == (4, 19, 2)
    assert details["j3d"].shape == (4, 19, 3)
    assert details["cam"].shape == (4, 3)


def test_shape_blend_moves_verts():
    m = smpl.synthetic_model()
    v0, _ = smpl.lbs(m, jnp.zeros(10), jnp.zeros(72))
    v1, _ = smpl.lbs(m, jnp.ones(10), jnp.zeros(72))
    assert float(jnp.abs(v1 - v0).max()) > 1e-3


def test_offsets_applied():
    m = smpl.synthetic_model()
    off = jnp.ones((6890, 3)) * 0.01
    v0, _ = smpl.lbs(m, jnp.zeros(10), jnp.zeros(72))
    v1, _ = smpl.lbs(m, jnp.zeros(10), jnp.zeros(72), offsets=off)
    np.testing.assert_allclose(np.asarray(v1 - v0), 0.01, atol=1e-5)


def test_smplh_pads_hand_pose():
    m = smpl.synthetic_model(n_joints=52, seed=1)
    verts, joints = smpl.lbs(m, jnp.zeros(10), jnp.zeros(72))  # body-only pose
    assert verts.shape == (6890, 3)
    assert joints.shape == (52, 3)
    theta = jnp.zeros((2, 85)).at[:, 0].set(1.0)
    theta_h = smpl.pad_theta_with_hands(theta, m)
    assert theta_h.shape == (2, 3 + 156 + 10)


def test_weak_perspective_projection():
    x3d = jnp.asarray([[[1.0, 2.0, 3.0]]])
    cam = jnp.asarray([[2.0, 0.5, -0.5]])
    j2d = np.asarray(smpl.batch_orth_proj_idrot(x3d, cam))
    np.testing.assert_allclose(j2d[0, 0], [3.0, 3.0], atol=1e-6)
