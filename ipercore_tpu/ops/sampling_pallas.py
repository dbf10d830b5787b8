"""Pallas TPU bilinear grid-sample — the gather-free warp kernel.

XLA lowers `grid_sample`'s 4-tap gather to per-index tile reads: every
gathered (1, C) slice costs a full (8, 128) VMEM tile transfer, ~1024x read
amplification — measured 11.5 ms/frame for the 512² UV warp (26% of the
synthesis budget). TPUs have no scatter/gather unit; the MXU is the gather
engine. This kernel keeps the whole source image resident in VMEM and:

  1. row stage (MXU): a two-tap one-hot weight matrix Wy (P, H) with the
     vertical bilinear weights at rows y0/y1 multiplies the channel-major
     image (H, C·W) — one matmul vertically interpolates every source row
     each output pixel could need;
  2. column stage (VPU): two-tap horizontal weights Wx (P, W), block-repeated
     across the C channel groups, multiply-reduce the interpolated rows.

Zero-padding semantics match `ops.sampling.grid_sample` exactly: each tap's
weight is zeroed when its coordinate leaves the image, and the separable
product wy·wx reproduces the 4-tap validity mask.

Cost: P·H·C·W MACs per frame (512²·512·1536 ≈ 206 GMAC bf16) ≈ 1-2 ms on one
chip vs 11.5 ms for the XLA gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output pixels per grid step; VMEM: img (H, C·W) + Wy (P, H) + rows f32
# (P, C·W) + per-channel (P, W) temporaries — ~11 MB at 512²x3 f32.
P_TILE = 512


def _sample_kernel(grid_ref, img_ref, out_ref, *, H, W, C):
    g = grid_ref[:]  # (P, 2) f32
    x = (g[:, 0] + 1.0) * (W * 0.5) - 0.5
    y = (g[:, 1] + 1.0) * (H * 0.5) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # two-tap vertical weights, zeroed out of range (zero-padding semantics)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, H), 1)
    wy0v = jnp.where((y0i >= 0) & (y0i < H), 1.0 - wy1, 0.0)
    wy1v = jnp.where((y0i + 1 >= 0) & (y0i + 1 < H), wy1, 0.0)
    Wy = jnp.where(rows_iota == y0i[:, None], wy0v[:, None],
                   jnp.where(rows_iota == (y0i + 1)[:, None],
                             wy1v[:, None], 0.0)).astype(img_ref.dtype)

    # (P, H) @ (H, C*W) -> vertically interpolated rows per output pixel
    rows = jnp.dot(Wy, img_ref[:], preferred_element_type=jnp.float32)

    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, W), 1)
    wx0v = jnp.where((x0i >= 0) & (x0i < W), 1.0 - wx1, 0.0)
    wx1v = jnp.where((x0i + 1 >= 0) & (x0i + 1 < W), wx1, 0.0)
    Wx = (
        (cols_iota == x0i[:, None]) * wx0v[:, None]
        + (cols_iota == (x0i + 1)[:, None]) * wx1v[:, None]
    ).astype(jnp.float32)

    # per-channel multiply-reduce over the channel-major blocks (avoids the
    # (P, C·W) repeated-weight temporary that blew the VMEM budget)
    outs = [jnp.sum(rows[:, c * W:(c + 1) * W] * Wx, axis=-1, keepdims=True)
            for c in range(C)]
    out_ref[:] = jnp.concatenate(outs, axis=-1)  # (P, C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_one(img: jnp.ndarray, grid: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """img: (H, W, C); grid: (h, w, 2) -> (h, w, C) f32."""
    H, W, C = img.shape
    h, w = grid.shape[0], grid.shape[1]
    P = h * w
    n_tiles = pl.cdiv(P, P_TILE)
    P_pad = n_tiles * P_TILE

    # channel-major (H, C*W) so Wx block-repeats cleanly across channels
    img_cm = jnp.transpose(img, (0, 2, 1)).reshape(H, C * W)
    grid_flat = grid.reshape(P, 2)
    if P_pad != P:
        grid_flat = jnp.pad(grid_flat, ((0, P_pad - P), (0, 0)),
                            constant_values=-2.0)  # sentinel -> zero output

    out = pl.pallas_call(
        functools.partial(_sample_kernel, H=H, W=W, C=C),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((P_TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C * W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P_TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, C), jnp.float32),
        interpret=interpret,
    )(grid_flat, img_cm)
    return out[:P].reshape(h, w, C)


def grid_sample_pallas(imgs: jnp.ndarray, grids: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Batched Pallas bilinear sample — drop-in for `sampling.grid_sample`.

    Args:
        imgs: (N, H, W, C); grids: (N, h, w, 2) with (x, y) in [-1, 1].

    Returns:
        (N, h, w, C) in f32 (cast to imgs.dtype by the caller if needed).
    """
    out = jax.vmap(lambda im, g: _sample_one(im, g, interpret))(imgs, grids)
    return out.astype(imgs.dtype) if imgs.dtype != jnp.float32 else out


def use_pallas_sampling() -> bool:
    """Pallas path is profitable on real TPUs only (CPU fallback = XLA gather)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
