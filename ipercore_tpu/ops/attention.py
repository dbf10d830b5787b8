"""Patch-attention ops shared by the inpainting and matting stacks.

TPU-first redesign of the CUDA contextual-attention kernels behind the
reference's mmedit DeepFillv2 / GCA mattor
(`iPERCore/tools/background_inpaintors/mmedit_inpaintors.py:22-59`,
`iPERCore/tools/human_mattors/point_render_parser.py:150-204`): patch match
scores become one cosine-similarity matmul (queries: every pixel's 3x3
feature patch; keys: known pixels, selected with an additive mask), softmax,
and reconstruction a second matmul — all MXU work with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class ContextualAttention(nn.Module):
    """Reconstruct masked-region features from known-region patches.

    Values are the center features of each patch (3x3 overlap-add smoothing
    is delegated to the decoder convs that follow)."""

    softmax_scale: float = 10.0

    @nn.compact
    def __call__(self, f, hole_mask):
        """f: (N, H, W, C); hole_mask: (N, H, W, 1) 1 = region to rebuild.
        Returns (N, H, W, C): attention-reconstructed features inside the
        mask, original features outside."""
        n, h, w, c = f.shape
        # 3x3 patches around every pixel: (N, H, W, C*9)
        patches = jax.lax.conv_general_dilated_patches(
            jnp.transpose(f, (0, 3, 1, 2)), (3, 3), (1, 1),
            ((1, 1), (1, 1)))
        patches = jnp.transpose(patches, (0, 2, 3, 1)).reshape(n, h * w, c * 9)
        qn = patches / jnp.maximum(
            jnp.linalg.norm(patches, axis=-1, keepdims=True), 1e-4)
        sim = jnp.einsum("nqc,nkc->nqk", qn, qn)  # cosine patch similarity
        known = (hole_mask.reshape(n, h * w) < 0.5)
        bias = jnp.where(known, 0.0, -1e9)[:, None, :]  # keys: known only
        attn = jax.nn.softmax(sim * self.softmax_scale + bias, axis=-1)
        recon = jnp.einsum("nqk,nkc->nqc", attn, f.reshape(n, h * w, c))
        recon = recon.reshape(n, h, w, c)
        return jnp.where(hole_mask > 0.5, recon, f)
