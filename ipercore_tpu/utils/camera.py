"""Weak-perspective camera strategies and crop<->original remaps.

Rebuilds `iPERCore/tools/utils/geometry/cam_pose_utils.py` (cam_swap:17,
stabilize:52, get_jump_mask:156, cam_init2orig:216, cam_norm:244) as pure
numpy/JAX functions.
"""
from __future__ import annotations

import numpy as np


def cam_swap(src_cam, ref_cam, first_cam=None, strategy: str = "smooth"):
    """Swap source/reference cameras — `cam_swap:17`.

    Args:
        src_cam/ref_cam: (N, 3) = (s, tx, ty); first_cam: (1 or N, 3) for
        the "smooth" strategy (first reference frame's camera).
    """
    import jax.numpy as jnp

    src_cam = jnp.asarray(src_cam)
    ref_cam = jnp.asarray(ref_cam)
    if strategy == "smooth":
        delta_xy = ref_cam[:, 1:] - first_cam[:, 1:]
        s = src_cam[:, 0:1] * ref_cam[:, 0:1] / first_cam[:, 0:1]
        return jnp.concatenate([s, src_cam[:, 1:] + delta_xy], axis=1)
    if strategy == "ref_txty":
        return jnp.concatenate([src_cam[:, 0:1], ref_cam[:, 1:]], axis=1)
    if strategy == "source":
        return src_cam
    return ref_cam  # "copy"


def get_checkpoints(y: np.ndarray) -> list[int]:
    """Local-extremum indices of a track — `get_checkpoints:131-153`, made
    robust to flat plateaus (zero derivative runs are forward-filled so an
    extremum flanked by equal samples is still detected)."""
    dy = np.diff(y)
    sign = np.sign(dy)
    # forward-fill zero signs
    last = 0.0
    filled = np.zeros_like(sign)
    for i, s in enumerate(sign):
        if s != 0:
            last = s
        filled[i] = last
    ckpts = [0]
    for i in range(1, len(filled)):
        if filled[i - 1] * filled[i] < 0:
            ckpts.append(i)
    ckpts.append(len(y) - 1)
    return ckpts


def get_jump_mask(final_foot_y: np.ndarray, up_th: float = 0.2, down_th: float = 0.1):
    """Detect jump intervals from the foot-y track — `get_jump_mask:156`."""
    n = final_foot_y.shape[0]
    jump_info = []
    ground_y = final_foot_y[0]
    ckpts = get_checkpoints(final_foot_y)
    jumping = False
    start = None
    for idx in range(1, len(ckpts)):
        i, i_1 = ckpts[idx], ckpts[idx - 1]
        y_i, y_i_1 = final_foot_y[i], final_foot_y[i_1]
        if y_i - y_i_1 < 0 and abs(y_i - y_i_1) > up_th:
            jumping = True
            start = None
            for f in range(i_1, i):
                if final_foot_y[f] < ground_y:
                    start = f
                    break
            if start is None:
                start = i_1
        elif jumping:
            if y_i < final_foot_y[start] and abs(y_i - final_foot_y[start]) > down_th:
                continue
            jumping = False
            jump_info.append((start, i))
            start = None
    if jumping:
        jump_info.append((start, n - 1))
    mask = np.zeros((n,))
    for s, e in jump_info:
        mask[s:e + 1] = 1
    return jump_info, mask


def stabilize_smpls(smpls: np.ndarray, foot_y: np.ndarray) -> np.ndarray:
    """Stabilize a target SMPL sequence by foot contact —
    `WeakPerspectiveCamera.stabilize` (`cam_pose_utils.py:52-100`).

    Reference semantics: the camera is reset to (s=1, tx=0), ty is pinned so
    the lowest body point (max vertex y in screen-down coords) stays on the
    first frame's ground line, jump intervals keep the original (clamped) ty,
    and the shape is locked to the first frame's betas.

    Args:
        smpls: (N, 85); foot_y: (N,) per-frame max body-vertex y from the SMPL
            forward pass (camera-free, body coords), see
            `models.imitator.infer_foot_y`.

    Returns:
        (N, 85) stabilized sequence.
    """
    smpls = np.array(smpls, np.float32)
    foot_y = np.asarray(foot_y, np.float32)
    cam_y = smpls[:, 2].copy()
    ground_y = cam_y[0]

    final_foot_y = foot_y + cam_y
    jump_info, _ = get_jump_mask(final_foot_y)

    new_cam_y = ground_y + (foot_y[0] - foot_y)
    for s, e in jump_info:
        new_cam_y[s:e + 1] = np.minimum(cam_y[s:e + 1], new_cam_y[s:e + 1])

    smpls[:, 0] = 1.0
    smpls[:, 1] = 0.0
    smpls[:, 2] = new_cam_y
    smpls[:, 75:] = smpls[0:1, 75:]
    return smpls


def cam_init2orig(cam, scale, start_pt, N: int = 224):
    """HMR crop camera -> original-image camera — `cam_init2orig:216`.

    Args: cam (bs, 3); scale (bs, 1) resize_h/orig_h; start_pt (bs, 2)."""
    import jax.numpy as jnp

    cam = jnp.asarray(cam)
    cam_crop = jnp.concatenate(
        [N * cam[:, 0:1] * 0.5, cam[:, 1:] + (2.0 / cam[:, 0:1]) * 0.5], axis=1)
    cam_orig = jnp.concatenate(
        [cam_crop[:, 0:1] / scale, cam_crop[:, 1:] + (start_pt - N) / cam_crop[:, 0:1]],
        axis=1)
    return cam_orig


def cam_norm(cam, N):
    """Original-image camera -> normalized [-1, 1] camera — `cam_norm:244`."""
    import jax.numpy as jnp

    cam = jnp.asarray(cam)
    return jnp.concatenate(
        [cam[:, 0:1] * (2.0 / N), cam[:, 1:] - N / (2 * cam[:, 0:1])], axis=1)
