import numpy as np
import jax.numpy as jnp

from ipercore_tpu.ops.morphology import erode, dilate, morph, soft_edge


def _dot_mask(s=16):
    m = np.zeros((1, s, s, 1), np.float32)
    m[0, s // 2, s // 2, 0] = 1.0
    return m


def test_dilate_grows_square():
    m = _dot_mask()
    out = np.asarray(dilate(jnp.asarray(m), 3))
    assert out.sum() == 9.0


def test_erode_removes_dot():
    m = _dot_mask()
    out = np.asarray(erode(jnp.asarray(m), 3))
    assert out.sum() == 0.0


def test_erode_dilate_inverse_on_big_block():
    m = np.zeros((1, 16, 16, 1), np.float32)
    m[0, 4:12, 4:12, 0] = 1.0
    er = np.asarray(erode(jnp.asarray(m), 3))
    back = np.asarray(dilate(jnp.asarray(er), 3))
    np.testing.assert_array_equal(back, m)


def test_morph_dispatch():
    m = jnp.asarray(_dot_mask())
    np.testing.assert_array_equal(np.asarray(morph(m, 3, "dilate")), np.asarray(dilate(m, 3)))
    np.testing.assert_array_equal(np.asarray(morph(m, 3, "erode")), np.asarray(erode(m, 3)))


def test_soft_edge_is_boundary_band():
    m = np.zeros((1, 16, 16, 1), np.float32)
    m[0, 4:12, 4:12, 0] = 1.0
    band = np.asarray(soft_edge(jnp.asarray(m), 3))
    # interior pixels are not edges
    assert band[0, 8, 8, 0] == 0.0
    # boundary pixels are
    assert band[0, 4, 4, 0] == 1.0
    assert band[0, 12, 12, 0] == 1.0
