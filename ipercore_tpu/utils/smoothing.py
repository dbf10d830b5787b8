"""Temporal smoothing of SMPL sequences (pose in rot6d + camera).

Rebuilds `iPERCore/tools/utils/signals/smooth.py` (temporal_smooth_smpls:442,
pose_temporal_smooth:473, kps interpolation :266): a zero-phase low-pass
(forward-backward exponential / Butterworth-like) over the rot6d pose
representation and the camera track. Host-side numpy — this runs once per
sequence before the jitted frame loop.
"""
from __future__ import annotations

import numpy as np


def _butter_lowpass_sos(fc: float, fs: float):
    """2nd-order Butterworth low-pass via scipy when available."""
    from scipy.signal import butter

    wn = min(max(fc / (fs / 2.0), 1e-4), 0.99)
    return butter(2, wn, btype="low", output="sos")


def lowpass_filtfilt(x: np.ndarray, fc: float, fs: float = 2208.0) -> np.ndarray:
    """Zero-phase low-pass along axis 0 (reference uses fs=2208 with
    pose_fc/cam_fc cutoffs, `smooth.py:442-471`). Falls back to a
    forward-backward EMA when scipy is unavailable or sequence is short."""
    n = x.shape[0]
    if n < 7:
        return x
    try:
        from scipy.signal import sosfiltfilt

        sos = _butter_lowpass_sos(fc, fs)
        return sosfiltfilt(sos, x, axis=0).astype(x.dtype)
    except Exception:
        alpha = min(fc / fs * 2 * np.pi, 1.0)
        out = x.copy()
        for sweep in (range(1, n), range(n - 2, -1, -1)):
            for i in sweep:
                out[i] = alpha * out[i] + (1 - alpha) * out[i - 1 if i > 0 else 0]
        return out


def temporal_smooth_smpls(
    smpls: np.ndarray, pose_fc: float = 300.0, cam_fc: float = 100.0
) -> np.ndarray:
    """Smooth an (N, 85) SMPL sequence — `temporal_smooth_smpls` (`smooth.py:442`):
    camera low-passed at cam_fc; pose converted to rot6d, low-passed at
    pose_fc, converted back (rot6d stays valid under linear filtering after
    re-orthonormalization); betas averaged."""
    import jax.numpy as jnp

    from ipercore_tpu.ops.rotations import axis_angle_to_rot6d, rot6d_to_axis_angle

    smpls = np.asarray(smpls, np.float32)
    n = smpls.shape[0]
    if n < 7:
        return smpls
    cam = lowpass_filtfilt(smpls[:, 0:3], cam_fc)
    pose_aa = smpls[:, 3:75].reshape(n, 24, 3)
    r6 = np.asarray(axis_angle_to_rot6d(jnp.asarray(pose_aa)))  # (n, 24, 6)
    r6 = lowpass_filtfilt(r6.reshape(n, -1), pose_fc).reshape(n, 24, 6)
    pose = np.asarray(rot6d_to_axis_angle(jnp.asarray(r6))).reshape(n, 72)
    shape = np.broadcast_to(smpls[:, 75:].mean(axis=0, keepdims=True), (n, 10))
    return np.concatenate([cam, pose, shape], axis=1).astype(np.float32)


def interpolate_invalid_kps(kps: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Linearly interpolate invalid joints over time — `smooth.py:266`.

    Args:
        kps: (N, K, D); valid: (N, K) bool.
    """
    kps = np.array(kps, np.float32)
    N, K = valid.shape
    t = np.arange(N)
    for k in range(K):
        good = valid[:, k]
        if good.all() or not good.any():
            continue
        for d in range(kps.shape[2]):
            kps[~good, k, d] = np.interp(t[~good], t[good], kps[good, k, d])
    return kps


def median_filter_time(x: np.ndarray, window: int) -> np.ndarray:
    """Median filter along axis 0 — `smooth.py:97-112` (`mean_filter`,
    which despite its name is scipy's median_filter)."""
    try:
        from scipy.ndimage import median_filter

        size = (window,) + (1,) * (x.ndim - 1)
        return median_filter(x, size=size, mode="nearest")
    except Exception:
        return x


def pose2d_temporal_filter(
    keypoints: np.ndarray, window_size: int = 5, mode: str = "median",
    fc: float = 300.0,
) -> np.ndarray:
    """Fix left/right joint swaps by nearest-neighbour re-permutation against
    a temporally filtered track — `pose2d_temporal_filter` (`smooth.py:141-190`).

    A 2D estimator often localizes joints correctly but flips their left/right
    identities for a few frames; smoothing the track and snapping each frame's
    joints to their nearest smoothed slot undoes the flip.

    Args:
        keypoints: (T, J, 2 or 3) with optional per-joint score;
        mode: "median" or "low-pass".

    Returns:
        (T, J, C) re-permuted keypoints.
    """
    kps = np.asarray(keypoints, np.float32)
    T, J, C = kps.shape
    if mode == "median":
        filtered = median_filter_time(kps, window_size)
    elif mode == "low-pass":
        filtered = lowpass_filtfilt(kps.reshape(T, -1), fc=fc).reshape(T, J, C)
    else:
        raise ValueError(f"mode must be median|low-pass, got {mode}")

    # (T, J, J) pairwise distances query x smoothed
    diff = kps[:, :, None, 0:2] - filtered[:, None, :, 0:2]
    dist = np.sum(diff ** 2, axis=-1)
    nn_ids = np.argmin(dist, axis=2)  # smoothed slot nearest to each query

    # reference semantics (`smooth.py:183-186`): output slot j takes the
    # original joint whose nearest smoothed slot chain picks it
    out = np.take_along_axis(kps, nn_ids[:, :, None], axis=1)
    return out


def pose_temporal_smooth(
    init_pose: np.ndarray, opt_pose: np.ndarray, threshold: float = 10.0
) -> np.ndarray:
    """Replace outlier optimized poses with their initializations —
    `pose_temporal_smooth` (`smooth.py:223-251`): frames where the rot6d L1
    distance between the SPIN init and the SMPLify result exceeds `threshold`
    are assumed diverged and fall back to the init pose.

    Args:
        init_pose, opt_pose: (T, 72) axis-angle body poses.

    Returns:
        (T, 72) with diverged frames replaced.
    """
    import jax.numpy as jnp

    from ipercore_tpu.ops import rotations as rot

    init_pose = np.asarray(init_pose, np.float32)
    opt_pose = np.asarray(opt_pose, np.float32)
    T = opt_pose.shape[0]
    init6d = np.asarray(rot.axis_angle_to_rot6d(
        jnp.asarray(init_pose.reshape(-1, 3)))).reshape(T, -1)
    opt6d = np.asarray(rot.axis_angle_to_rot6d(
        jnp.asarray(opt_pose.reshape(-1, 3)))).reshape(T, -1)
    diff = np.abs(init6d - opt6d).sum(axis=1)
    out = opt_pose.copy()
    out[diff > threshold] = init_pose[diff > threshold]
    return out
