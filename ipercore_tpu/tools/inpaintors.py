"""Background inpainting + super-resolution.

Rebuilds `iPERCore/tools/background_inpaintors/mmedit_inpaintors.py:29-134`
(`SuperResolutionInpaintors.run_inpainting:69`): deepfillv2-style gated-conv
inpainting at a control size, then RRDB (ESRGAN-style) 4x super-resolution
back to the original size. Both are flax modules with torch-weight converters;
untrained they degrade to diffusion fill (the pipeline remains runnable and the
background is plausible — the reference's result is also only a pseudo-bg
supervision signal, `lwg_trainer.py:609-620`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.models.networks.blocks import PAD3
from ipercore_tpu.ops.sampling import resize_image

# Trained-on-device weights (scripts/train_inpaintor.py) — auto-loaded when
# present, upgrading inpainting from the diffusion fallback to the gated net.
INPAINT_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "inpaintor.npz")
# Trained-on-device 4x SR weights (scripts/train_esrgan.py); converted torch
# `esrgan_psnr_x4c64b23g32` weights use the same layout (convert_esrgan).
SR_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(INPAINT_DEFAULT_WEIGHTS), "esrgan.npz")
# Stage-2 contextual-attention refinement weights
# (scripts/train_inpaintor.py --stage 2).
REFINE_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(INPAINT_DEFAULT_WEIGHTS), "inpaintor_refine.npz")


class GatedConv(nn.Module):
    """Gated convolution (deepfillv2 primitive)."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        pad = ((d, d), (d, d))
        y = nn.Conv(self.features * 2, (3, 3), strides=(self.stride,) * 2,
                    padding=pad, kernel_dilation=(d, d))(x)
        feat, gate = jnp.split(y, 2, axis=-1)
        return nn.elu(feat) * nn.sigmoid(gate)


class GatedInpaintor(nn.Module):
    """Coarse gated-conv inpainting network (deepfillv2 stage-1 topology)."""

    width: int = 48

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 4) = masked RGB + mask. Returns (N, H, W, 3)."""
        w = self.width
        y = GatedConv(w)(x)
        y = GatedConv(2 * w, stride=2)(y)
        y = GatedConv(2 * w)(y)
        y = GatedConv(4 * w, stride=2)(y)
        for d in (1, 2, 4, 8):
            y = GatedConv(4 * w, dilation=d)(y)
        y = GatedConv(4 * w)(y)
        y = nn.ConvTranspose(2 * w, (4, 4), strides=(2, 2), padding="SAME")(y)
        y = GatedConv(2 * w)(y)
        y = nn.ConvTranspose(w, (4, 4), strides=(2, 2), padding="SAME")(y)
        y = GatedConv(w)(y)
        return jnp.tanh(nn.Conv(3, (3, 3), padding=PAD3)(y))


# deepfillv2's contextual-attention operator, shared with the GCA-style
# mattor — see `ops/attention.py` for the TPU-first design notes.
from ipercore_tpu.ops.attention import ContextualAttention  # noqa: E402


class RefineInpaintor(nn.Module):
    """deepfillv2 STAGE-2 refinement (the reference's DeepFillv2 via mmedit,
    `mmedit_inpaintors.py:22-59`): two parallel encoder branches over the
    coarse result — a dilated gated-conv branch and a contextual-attention
    branch — concatenated and decoded to the refined RGB."""

    width: int = 48

    @nn.compact
    def __call__(self, x, hole_mask):
        """x: (N, H, W, 4) = coarse-filled RGB + mask; hole_mask: (N, H, W, 1).
        Returns (N, H, W, 3) refined RGB in [-1, 1]."""
        w = self.width
        # --- dilated conv branch
        a = GatedConv(w)(x)
        a = GatedConv(2 * w, stride=2)(a)
        a = GatedConv(2 * w)(a)
        a = GatedConv(4 * w, stride=2)(a)
        for d in (1, 2, 4, 8):
            a = GatedConv(4 * w, dilation=d)(a)
        # --- contextual attention branch (attention at H/4 resolution)
        b = GatedConv(w)(x)
        b = GatedConv(w, stride=2)(b)
        b = GatedConv(2 * w)(b)
        b = GatedConv(2 * w, stride=2)(b)
        b = GatedConv(4 * w)(b)
        m4 = (resize_image(hole_mask, b.shape[1], b.shape[2]) > 0.25).astype(b.dtype)
        b = ContextualAttention()(b, m4)
        b = GatedConv(4 * w)(b)
        # --- merge + decode
        y = jnp.concatenate([a, b], axis=-1)
        y = GatedConv(4 * w)(y)
        y = nn.ConvTranspose(2 * w, (4, 4), strides=(2, 2), padding="SAME")(y)
        y = GatedConv(2 * w)(y)
        y = nn.ConvTranspose(w, (4, 4), strides=(2, 2), padding="SAME")(y)
        y = GatedConv(w)(y)
        return jnp.tanh(nn.Conv(3, (3, 3), padding=PAD3)(y))


class ResidualDenseBlock(nn.Module):
    """ESRGAN residual dense block: conv1..conv4 emit `growth` channels from
    the running concat (lrelu 0.2), conv5 projects back to `width`,
    out = x + 0.2 * conv5 — exact layer parity with the published RRDBNet."""

    width: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            y = nn.Conv(self.growth, (3, 3), padding=PAD3,
                        name=f"conv{i + 1}")(jnp.concatenate(feats, axis=-1))
            feats.append(nn.leaky_relu(y, 0.2))
        out = nn.Conv(self.width, (3, 3), padding=PAD3,
                      name="conv5")(jnp.concatenate(feats, axis=-1))
        return x + 0.2 * out


class RRDB(nn.Module):
    """Residual-in-residual dense block: 3 RDBs + 0.2-scaled residual."""

    width: int = 64
    growth: int = 32

    @nn.compact
    def __call__(self, x):
        y = ResidualDenseBlock(self.width, self.growth, name="rdb1")(x)
        y = ResidualDenseBlock(self.width, self.growth, name="rdb2")(y)
        y = ResidualDenseBlock(self.width, self.growth, name="rdb3")(y)
        return x + 0.2 * y


class RRDBNet(nn.Module):
    """ESRGAN 4x RRDBNet — exact architecture of the reference's SR net
    (`esrgan_psnr_x4c64b23g32_1x16_1000k_div2k` ckpt wired by
    `mmedit_inpaintors.py:57-59`): conv_first, 23 RRDBs, conv_body residual
    trunk, nearest-2x conv_up1/conv_up2, conv_hr, linear conv_last; lrelu 0.2.
    Operates in the checkpoint's native [0, 1] image domain.
    `utils.torch_convert.convert_esrgan` drops the published weights in."""

    width: int = 64
    growth: int = 32
    n_blocks: int = 23

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) in [0, 1] -> (N, 4H, 4W, 3)."""
        feat = nn.Conv(self.width, (3, 3), padding=PAD3, name="conv_first")(x)
        y = feat
        for i in range(self.n_blocks):
            y = RRDB(self.width, self.growth, name=f"body_{i}")(y)
        y = feat + nn.Conv(self.width, (3, 3), padding=PAD3, name="conv_body")(y)
        for nm in ("conv_up1", "conv_up2"):
            n, h, w, c = y.shape
            y = jax.image.resize(y, (n, h * 2, w * 2, c), "nearest")
            y = nn.leaky_relu(
                nn.Conv(self.width, (3, 3), padding=PAD3, name=nm)(y), 0.2)
        y = nn.leaky_relu(
            nn.Conv(self.width, (3, 3), padding=PAD3, name="conv_hr")(y), 0.2)
        return nn.Conv(3, (3, 3), padding=PAD3, name="conv_last")(y)


def diffusion_fill(img: jnp.ndarray, mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """Iterative masked diffusion inpaint (training-free fallback).

    img: (N, H, W, 3); mask: (N, H, W, 1) 1 = hole to fill.
    """
    from ipercore_tpu.models.flow_composition import boundary_fill

    known = 1.0 - mask
    return boundary_fill(img, known, jnp.ones_like(mask), iters=iters)


class SuperResolutionInpaintor:
    """Inpaint at control size + SR back — `SuperResolutionInpaintors` (:29)."""

    def __init__(self, inpaint_params=None, sr_params=None, control_size: int = 256,
                 trained: bool = False, sr_blocks: int = 23,
                 weights_path: str = None, refine_params=None,
                 refine_weights_path: str = None):
        self.control_size = control_size
        self.net = GatedInpaintor()
        self.refine = RefineInpaintor()
        self.sr = RRDBNet(n_blocks=sr_blocks)

        def _load(path):
            from ipercore_tpu.utils.checkpoint import load_params

            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x), jnp.float32),
                load_params(path))

        if inpaint_params is None:
            path = weights_path or INPAINT_DEFAULT_WEIGHTS
            if os.path.exists(path):
                inpaint_params = _load(path)
        self.trained = trained or (inpaint_params is not None)
        s = control_size
        if inpaint_params is None:
            inpaint_params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)))
        # stage-2 refinement: only active with trained weights (an untrained
        # attention decoder would corrupt the stage-1 result)
        self.refine_trained = refine_params is not None
        rpath = refine_weights_path or REFINE_DEFAULT_WEIGHTS
        if refine_params is None and os.path.exists(rpath):
            refine_params = _load(rpath)
            self.refine_trained = True
        if refine_params is None:
            refine_params = jax.jit(self.refine.init)(
                jax.random.PRNGKey(2), jnp.zeros((1, s, s, 4)),
                jnp.zeros((1, s, s, 1)))
        self.sr_trained = sr_params is not None
        if sr_params is None and os.path.exists(SR_DEFAULT_WEIGHTS):
            sr_params = _load(SR_DEFAULT_WEIGHTS)
            self.sr_trained = True
        if sr_params is None:
            sr_params = jax.jit(self.sr.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3)))
        self.inpaint_params = inpaint_params
        self.refine_params = refine_params
        self.sr_params = sr_params
        self._inpaint = jax.jit(self.net.apply)
        self._refine = jax.jit(self.refine.apply)
        self._sr = jax.jit(self.sr.apply)

    def run_inpainting(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) in [-1, 1]; mask: (H, W, 1) 1 = human region to remove.

        Returns: (H, W, 3) inpainted background — `run_inpainting:69`
        (coarse gated stage, optional contextual-attention refinement, SR).
        """
        H, W = image.shape[:2]
        s = self.control_size
        img_c = resize_image(jnp.asarray(image), s, s)[None]
        mask_c = (resize_image(jnp.asarray(mask), s, s)[None] > 0.5).astype(jnp.float32)
        if self.trained:
            x = jnp.concatenate([img_c * (1 - mask_c), mask_c], axis=-1)
            out = self._inpaint(self.inpaint_params, x)
            out = img_c * (1 - mask_c) + out * mask_c
            if self.refine_trained:
                x2 = jnp.concatenate([out, mask_c], axis=-1)
                ref = self._refine(self.refine_params, x2, mask_c)
                out = img_c * (1 - mask_c) + ref * mask_c
        else:
            out = diffusion_fill(img_c * (1 - mask_c), mask_c)
        if (H, W) != (s, s):
            if self.sr_trained and max(H, W) >= 4 * s:
                # RRDBNet runs in the ESRGAN checkpoint's [0, 1] domain
                out = self._sr(self.sr_params, (out + 1.0) * 0.5)
                out = jnp.clip(out, 0.0, 1.0) * 2.0 - 1.0
            out = resize_image(out, H, W)
        return np.asarray(out[0])


def build_background_inpaintors(name: str = "gated_conv+rrdb", **kw) -> SuperResolutionInpaintor:
    """Builder parity with `build_background_inpaintors` (`preprocessors.py:83`)."""
    return SuperResolutionInpaintor(**kw)
