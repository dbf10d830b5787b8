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
    y0i = y0.astype(jnp.int32)

    # coordinates/weights compute in the grid dtype (f32 for accuracy); the
    # blend happens in the image dtype so bf16 feature chains stay bf16.
    C = img.shape[-1]
    w = lambda a: a[..., None].astype(img.dtype)

    if C <= 64:
        # Single-gather formulation: a TPU row gather reads whole VMEM tiles
        # per index, so gathering one 4C-wide row (the four bilinear taps
        # stacked channel-wise from 1-px-shifted copies) costs a fraction of
        # four C-wide gathers while 4C stays within ~2 lane tiles (measured
        # at 256^2: C=64 f32 6.8 -> 4.8 ms, bf16 7.6 -> 3.3 ms; at C >= 128
        # the wider rows erase the win, so the 4-tap path remains below).
        # A 1-px zero pad makes every shifted tap exact for y0/x0 in
        # [-1, H-1]; one far-out-of-bounds mask covers the rest (torch
        # zero-padding semantics).
        imgp = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
        stacked = jnp.concatenate(
            [imgp[:-1, :-1], imgp[:-1, 1:], imgp[1:, :-1], imgp[1:, 1:]],
            axis=-1)  # (H+1, W+1, 4C): [tap00 | tap01 | tap10 | tap11]

        by = jnp.clip(y0i + 1, 0, H)
        bx = jnp.clip(x0i + 1, 0, W)
        flat = stacked.reshape((H + 1) * (W + 1), 4 * C)
        taps = jnp.take(flat, by * (W + 1) + bx, axis=0)  # (..., 4C)

        valid = (y0i >= -1) & (y0i <= H - 1) & (x0i >= -1) & (x0i <= W - 1)
        out = (
            taps[..., 0 * C:1 * C] * w(wy0 * wx0)
            + taps[..., 1 * C:2 * C] * w(wy0 * wx1)
            + taps[..., 2 * C:3 * C] * w(wy1 * wx0)
            + taps[..., 3 * C:4 * C] * w(wy1 * wx1)
        )
        return jnp.where(valid[..., None], out, 0.0)

    # Wide-channel levels (C >= 128): stacking all four taps would make 4C-wide
    # rows whose extra lane tiles erase the single-gather win, but stacking just
    # the horizontal pair keeps rows at 2C and replaces four C-wide gathers with
    # two 2C-wide ones — gather cost is dominated by per-index overhead, so this
    # is ~2x cheaper. The x boundary is exact via a 1-px zero pad (x0 in
    # [-1, W-1]); each row's y validity is masked per tap (torch zero padding).
    imgp = jnp.pad(img, ((0, 0), (1, 1), (0, 0)))
    stacked = jnp.concatenate([imgp[:, :-1], imgp[:, 1:]], axis=-1)  # (H, W+1, 2C)
    flat = stacked.reshape(H * (W + 1), 2 * C)

    y1i = y0i + 1
    bx = jnp.clip(x0i + 1, 0, W)
    vx = (x0i >= -1) & (x0i <= W - 1)
    rows = []
    for yi in (y0i, y1i):
        yc = jnp.clip(yi, 0, H - 1)
        taps = jnp.take(flat, yc * (W + 1) + bx, axis=0)  # (..., 2C)
        ok = vx & (yi >= 0) & (yi <= H - 1)
        hx = taps[..., :C] * w(wx0) + taps[..., C:] * w(wx1)
        rows.append(jnp.where(ok[..., None], hx, 0.0))
    return rows[0] * w(wy0) + rows[1] * w(wy1)


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
