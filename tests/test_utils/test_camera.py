import numpy as np
import jax.numpy as jnp

from ipercore_tpu.utils.camera import (
    cam_swap, get_jump_mask, stabilize_smpls, cam_init2orig, cam_norm,
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
    smpls[:, 0] = 1.3   # arbitrary scale/tx get reset
    smpls[:, 1] = 0.2
    smpls[:, 75] = np.arange(n) * 0.01  # drifting betas get locked to frame 0
    foot_y = np.zeros(n)
    foot_y[5:10] = 0.05  # drift, not a jump
    out = stabilize_smpls(smpls, foot_y)
    # ty compensates the foot drift so feet stay on frame-0's ground line
    np.testing.assert_allclose(out[5:10, 2], -0.05, atol=1e-6)
    np.testing.assert_allclose(out[:, 0], 1.0)
    np.testing.assert_allclose(out[:, 1], 0.0)
    np.testing.assert_allclose(out[:, 75], 0.0, atol=1e-6)


def test_stabilize_keeps_jumps():
    n = 30
    smpls = np.zeros((n, 85), np.float32)
    foot_y = np.zeros(n)
    foot_y[10:20] = -np.sin(np.linspace(0, np.pi, 10)) * 0.5  # a real jump
    out = stabilize_smpls(smpls, foot_y)
    # inside the jump the original (zero) cam ty is kept where it is lower
    # than the compensated track, so the jump still reads as airborne
    assert np.max(out[10:20, 2]) <= 0.5 + 1e-6
    assert np.min(out[12:18, 2]) <= 0.0 + 1e-6
    # outside the jump the ground is pinned
    np.testing.assert_allclose(out[:8, 2], 0.0, atol=1e-6)


def test_cam_roundtrip_norm():
    cam = jnp.asarray([[0.9, 0.1, -0.2]])
    scale = jnp.asarray([[0.5]])
    start = jnp.asarray([[10.0, 20.0]])
    orig = cam_init2orig(cam, scale, start, N=224)
    back = cam_norm(orig, N=224 / 0.5)
    assert np.isfinite(np.asarray(back)).all()
