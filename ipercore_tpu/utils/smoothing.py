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
