"""Bilinear grid sampling (the Liquid Warping primitive) and flow resizing.

TPU-native replacement for the reference's `F.grid_sample` calls (torch defaults:
bilinear, zero padding, align_corners=False) that back every warp in the pipeline —
LWB feature warping (`iPERCore/models/networks/generators/attlwb_spade_resunet.py:184-191`),
UV merging (`iPERCore/models/flowcomposition.py:117`), and texture extraction
(`iPERCore/tools/human_digitalizer/renders/nmr.py:447`).

Layout is NHWC (TPU conv-friendly). Grids carry (x, y) in [-1, 1] where
(-1, -1) maps to the top-left pixel area (align_corners=False convention):
    pixel_x = (x + 1) * W / 2 - 0.5
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Gather img[iy, ix] with zero fill where invalid.

    img: (H, W, C); iy/ix/valid: (...,) -> returns (..., C).
    """
    H, W, C = img.shape
    iy_c = jnp.clip(iy, 0, H - 1)
    ix_c = jnp.clip(ix, 0, W - 1)
    flat = img.reshape(H * W, C)
    vals = jnp.take(flat, iy_c * W + ix_c, axis=0)
    return jnp.where(valid[..., None], vals, 0.0)


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample a single image at flow-grid locations.

    Args:
        img: (H, W, C) source image/feature map.
        grid: (h, w, 2) sampling locations, (x, y) in [-1, 1]; out-of-range
            coordinates contribute zeros (torch zero-padding semantics). Flow
            values of -2 (the "no source" sentinel used throughout the flow
            composition) therefore sample to zero.

    Returns:
        (h, w, C) sampled output.
    """
    H, W, _ = img.shape
    x = (grid[..., 0] + 1.0) * (W * 0.5) - 0.5
    y = (grid[..., 1] + 1.0) * (H * 0.5) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)

    vx0 = (x0i >= 0) & (x0i < W)
    vx1 = (x1i >= 0) & (x1i < W)
    vy0 = (y0i >= 0) & (y0i < H)
    vy1 = (y1i >= 0) & (y1i < H)

    # coordinates/weights compute in the grid dtype (f32 for accuracy); the
    # blend happens in the image dtype so bf16 feature chains stay bf16.
    w = lambda a: a[..., None].astype(img.dtype)
    out = (
        _gather_2d(img, y0i, x0i, vy0 & vx0) * w(wy0 * wx0)
        + _gather_2d(img, y0i, x1i, vy0 & vx1) * w(wy0 * wx1)
        + _gather_2d(img, y1i, x0i, vy1 & vx0) * w(wy1 * wx0)
        + _gather_2d(img, y1i, x1i, vy1 & vx1) * w(wy1 * wx1)
    )
    return out


def grid_sample(imgs: jnp.ndarray, grids: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear grid sample.

    Args:
        imgs: (N, H, W, C).
        grids: (N, h, w, 2), (x, y) in [-1, 1].

    Returns:
        (N, h, w, C)
    """
    return jax.vmap(grid_sample_2d)(imgs, grids)


def resize_flow(flow: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Resize a flow grid to a feature map's resolution (values unchanged).

    Equivalent of the reference LWB's `resize_trans`
    (`attlwb_spade_resunet.py:175-182`, bilinear + align_corners=True).

    Args:
        flow: (..., H, W, 2)

    Returns:
        (..., h, w, 2)
    """
    if flow.shape[-3] == h and flow.shape[-2] == w:
        return flow
    out_shape = flow.shape[:-3] + (h, w, 2)
    # jax.image.resize "linear" matches align_corners=False; the reference uses
    # align_corners=True here. For flow fields the difference is a sub-pixel
    # shift of where flow vectors are re-sampled; we keep XLA's native resize
    # (fused, fast) and document the divergence.
    return jax.image.resize(flow, out_shape, method="linear")


def resize_image(img: jnp.ndarray, h: int, w: int, method: str = "linear") -> jnp.ndarray:
    """Resize (..., H, W, C) image(s) to (..., h, w, C)."""
    if img.shape[-3] == h and img.shape[-2] == w:
        return img
    out_shape = img.shape[:-3] + (h, w, img.shape[-1])
    return jax.image.resize(img, out_shape, method=method)
