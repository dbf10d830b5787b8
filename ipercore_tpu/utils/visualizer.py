"""Visual inspection: SMPL overlay frames / videos for preprocessing QA.

Rebuilds `iPERCore/tools/utils/visualizers/smpl_visualizer.py:17`
(`visual_pose3d_results` — the human-check `visual.mp4` written by
preprocessing stage 1.7) without visdom: the rendered part-condition map is
alpha-blended over the cropped frames.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def smpl_overlay_frames(imgs: np.ndarray, theta: np.ndarray, model=None,
                        assets=None, alpha: float = 0.5) -> np.ndarray:
    """Blend the rendered SMPL part map over frames.

    Args:
        imgs: (N, S, S, 3) in [-1, 1]; theta: (N, 85).

    Returns:
        (N, S, S, 3) overlay frames in [-1, 1].
    """
    import jax.numpy as jnp

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.models.mesh import load_assets
    from ipercore_tpu.ops import rasterizer as rz

    if model is None:
        model = smpl_mod.synthetic_model()
    if assets is None:
        assets = load_assets(model)
    S = imgs.shape[1]
    # chunked: bound full-clip raster buffers. 8 frames at 512² — a 32-frame
    # 512² raster chunk alone exceeded a 16 GB HBM chip (real 219-frame clip).
    step = max(1, 8 * (512 // max(S, 1)) ** 2)
    out = []
    for i in range(0, len(theta), step):
        d = smpl_mod.get_details(model, jnp.asarray(theta[i:i + step]))
        _, fim, _ = rz.render_fim_wim(d["verts"], d["cam"], model.faces, S)
        cond = np.asarray(rz.encode_fim(fim, assets.map_fn))  # (n, S, S, 3) in [0,1]
        body = np.asarray(fim >= 0)[..., None]
        chunk = imgs[i:i + step]
        out.append(chunk * (1 - alpha * body) + (cond * 2.0 - 1.0) * (alpha * body))
    return np.concatenate(out).astype(np.float32)


def write_visual_video(imgs: np.ndarray, theta: np.ndarray, out_path: str,
                       fps: float = 25.0, model=None, assets=None) -> Optional[str]:
    """Write the QA overlay as `visual.mp4` (or a frame folder without ffmpeg)
    — preprocessing stage 1.7 (`preprocessors.py:379-421`)."""
    from ipercore_tpu.utils import video as vid

    frames = smpl_overlay_frames(imgs, theta, model, assets)
    out_dir = os.path.splitext(out_path)[0] + "_frames"
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, f in enumerate(frames):
        p = os.path.join(out_dir, f"frame_{i:08d}.png")
        vid.save_image(p, f)
        paths.append(p)
    # make_video falls back to cv2 itself — no has_ffmpeg() gate
    try:
        return vid.make_video(paths, out_path, fps=fps)
    except Exception:
        return out_dir


def save_train_panel(path: str, rows: dict) -> str:
    """Write a labeled image grid png — the file-based stand-in for the
    reference's TBVisualizer image panels (`tb_visualizer.py:38-76`,
    `vis_named_img`): one row per named tensor, one column per batch sample.

    Args:
        rows: name -> (N, H, W, C) float array in [-1, 1] (C in {1, 3}).

    Returns: the written path.
    """
    from ipercore_tpu.utils import video as vid

    tiles = []
    for name in rows:
        imgs = np.asarray(rows[name], np.float32)
        if imgs.ndim == 3:
            imgs = imgs[..., None]
        if imgs.shape[-1] == 1:
            imgs = np.repeat(imgs, 3, axis=-1)
        tiles.append(np.concatenate(list(imgs), axis=1))  # (H, N*W, 3)
    panel = np.concatenate(tiles, axis=0)  # (R*H, N*W, 3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vid.save_image(path, np.clip(panel, -1.0, 1.0))
    return path
