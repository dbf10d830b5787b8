import numpy as np

from ipercore_tpu.utils.smoothing import (
    temporal_smooth_smpls, lowpass_filtfilt, interpolate_invalid_kps,
)


def test_lowpass_reduces_noise():
    rng = np.random.RandomState(0)
    t = np.linspace(0, 1, 200)
    clean = np.sin(2 * np.pi * 2 * t)[:, None]
    noisy = clean + rng.randn(200, 1) * 0.3
    sm = lowpass_filtfilt(noisy.astype(np.float32), fc=150.0)
    assert np.abs(sm - clean).mean() < np.abs(noisy - clean).mean()


def test_temporal_smooth_smpls_preserves_shape_and_validity():
    rng = np.random.RandomState(1)
    n = 50
    smpls = np.zeros((n, 85), np.float32)
    smpls[:, 0] = 1.0 + rng.randn(n) * 0.01
    smpls[:, 3:75] = rng.randn(n, 72) * 0.1
    smpls[:, 75:] = rng.randn(1, 10) * 0.3
    out = temporal_smooth_smpls(smpls)
    assert out.shape == (n, 85)
    # pose columns remain valid axis-angle scale
    assert np.abs(out[:, 3:75]).max() < np.pi + 0.2
    # betas now constant over time
    assert np.abs(np.diff(out[:, 75:], axis=0)).max() < 1e-5


def test_temporal_smooth_short_sequence_passthrough():
    smpls = np.random.RandomState(2).randn(3, 85).astype(np.float32)
    np.testing.assert_array_equal(temporal_smooth_smpls(smpls), smpls)


def test_interpolate_invalid_kps():
    kps = np.zeros((5, 2, 2), np.float32)
    kps[:, 0, 0] = [0, 1, 2, 3, 4]
    kps[:, 1, 0] = [0, 99, 99, 99, 4]
    valid = np.ones((5, 2), bool)
    valid[1:4, 1] = False
    out = interpolate_invalid_kps(kps, valid)
    np.testing.assert_allclose(out[:, 1, 0], [0, 1, 2, 3, 4], atol=1e-5)


def test_pose2d_temporal_filter_fixes_lr_swap():
    """A mid-sequence left/right label flip is undone by NN re-permutation."""
    from ipercore_tpu.utils.smoothing import pose2d_temporal_filter

    T, J = 21, 4
    base = np.stack([
        np.full((T,), 10.0), np.full((T,), 50.0),
        np.full((T,), 90.0), np.full((T,), 130.0)], axis=1)  # (T, J) x coords
    kps = np.stack([base, np.full((T, J), 7.0)], axis=-1)  # (T, J, 2)
    swapped = kps.copy()
    swapped[10, 0], swapped[10, 1] = kps[10, 1], kps[10, 0]  # flip joints 0/1

    fixed = pose2d_temporal_filter(swapped, window_size=5, mode="median")
    np.testing.assert_allclose(fixed[10], kps[10], atol=1e-5)
    # untouched frames stay identical
    np.testing.assert_allclose(fixed[0], kps[0], atol=1e-5)


def test_pose_temporal_smooth_replaces_outliers():
    from ipercore_tpu.utils.smoothing import pose_temporal_smooth

    rng = np.random.RandomState(0)
    T = 8
    init = rng.uniform(-0.2, 0.2, (T, 72)).astype(np.float32)
    opt = init.copy()
    opt[3] += np.pi  # wildly diverged frame
    opt[5] += 0.01   # tiny refinement — must be kept
    out = pose_temporal_smooth(init, opt, threshold=10.0)
    np.testing.assert_allclose(out[3], init[3], atol=1e-6)
    np.testing.assert_allclose(out[5], opt[5], atol=1e-6)
