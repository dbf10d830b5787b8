"""Binary morphology and edge ops on NHWC masks, built on XLA reduce_window.

TPU-native equivalents of the reference's conv-based morphology
(`iPERCore/tools/utils/morphology/morph_ops.py:7-61`) and differentiable Canny
(`iPERCore/tools/utils/morphology/canny_ops.py`). reduce_window lowers to fused
vector max/min ops — cheaper than the reference's thresholded conv2d.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_reduce(x: jnp.ndarray, ks: int, init: float, op) -> jnp.ndarray:
    """Apply a (ks, ks) same-padded window reduction over the H, W axes of NHWC."""
    if ks <= 1:
        return x
    pad = ks // 2
    return jax.lax.reduce_window(
        x,
        init,
        op,
        window_dimensions=(1, ks, ks, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def dilate(mask: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Grayscale/binary dilation with a ks x ks square element. mask: (N, H, W, C)."""
    return _window_reduce(mask, ks, -jnp.inf, jax.lax.max)


def erode(mask: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Grayscale/binary erosion with a ks x ks square element. mask: (N, H, W, C)."""
    return _window_reduce(mask, ks, jnp.inf, jax.lax.min)


def morph(mask: jnp.ndarray, ks: int, mode: str) -> jnp.ndarray:
    """Reference-compatible entry point (`morph_ops.py:7`): mode in {erode, dilate}."""
    if mode == "erode":
        return erode(mask, ks)
    if mode == "dilate":
        return dilate(mask, ks)
    raise ValueError(f"unknown morph mode: {mode}")


def soft_edge(mask: jnp.ndarray, ks: int = 3) -> jnp.ndarray:
    """Boundary band of a binary mask: dilate(mask) - erode(mask).

    A cheap, fully-vectorized stand-in for the reference's Canny thin-edge
    extraction of the confidant silhouette (`flowcomposition.py:363-366`):
    downstream only consumes boundary *pixels* as nearest-neighbour fill
    candidates, for which the morphological gradient band is equivalent.
    """
    return jnp.clip(dilate(mask, ks) - erode(mask, ks), 0.0, 1.0)


def gaussian_blur(img: jnp.ndarray, sigma: float = 1.0, ks: int = 5) -> jnp.ndarray:
    """Separable gaussian blur over NHWC images (used by edge detection / AA)."""
    radius = ks // 2
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)
    # Convolve H then W via depthwise conv expressed as reduce-sum over shifts.
    def conv_axis(x, axis):
        out = jnp.zeros_like(x)
        for i, w in enumerate(k):
            shift = i - radius
            out = out + w * jnp.roll(x, shift, axis=axis)
        return out

    return conv_axis(conv_axis(img, 1), 2)


def sobel_edges(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients (gx, gy) of an NHWC image via XLA conv."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=jnp.float32)
    ky = kx.T
    C = img.shape[-1]

    def depthwise(x, k):
        kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # HWIO with I=1 (depthwise)
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    return depthwise(img, kx), depthwise(img, ky)
