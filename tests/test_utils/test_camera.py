import numpy as np
import jax.numpy as jnp

from ipercore_tpu.utils.camera import (
    cam_swap, get_jump_mask, stabilize_cam_by_foot_contact, cam_init2orig, cam_norm,
)


def test_cam_swap_strategies():
    src = jnp.asarray([[1.0, 0.1, 0.2]])
    ref = jnp.asarray([[2.0, 0.5, 0.6]])
    first = jnp.asarray([[1.0, 0.3, 0.3]])
    sm = np.asarray(cam_swap(src, ref, first, "smooth"))[0]
    np.testing.assert_allclose(sm, [2.0, 0.1 + 0.2, 0.2 + 0.3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam_swap(src, ref, None, "source")), np.asarray(src))
    np.testing.assert_allclose(np.asarray(cam_swap(src, ref, None, "copy")), np.asarray(ref))
    rt = np.asarray(cam_swap(src, ref, None, "ref_txty"))[0]
    np.testing.assert_allclose(rt, [1.0, 0.5, 0.6], atol=1e-6)


def test_jump_mask_detects_jump():
    y = np.concatenate([np.zeros(10), -np.sin(np.linspace(0, np.pi, 10)) * 0.5, np.zeros(10)])
    info, mask = get_jump_mask(y)
    assert len(info) == 1
    assert mask[12:17].all()
    assert not mask[:8].any()


def test_stabilize_pins_ground():
    n = 20
    smpls = np.zeros((n, 85), np.float32)
    foot_y = np.zeros(n)
    foot_y[5:10] = 0.05  # drift, not a jump
    out = stabilize_cam_by_foot_contact(smpls, foot_y)
    np.testing.assert_allclose(out[5:10, 2], -0.05, atol=1e-6)


def test_cam_roundtrip_norm():
    cam = jnp.asarray([[0.9, 0.1, -0.2]])
    scale = jnp.asarray([[0.5]])
    start = jnp.asarray([[10.0, 20.0]])
    orig = cam_init2orig(cam, scale, start, N=224)
    back = cam_norm(orig, N=224 / 0.5)
    assert np.isfinite(np.asarray(back)).all()
