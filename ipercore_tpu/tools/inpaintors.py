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
                 weights_path: str = None):
        self.control_size = control_size
        self.net = GatedInpaintor()
        self.sr = RRDBNet(n_blocks=sr_blocks)
        if inpaint_params is None:
            path = weights_path or INPAINT_DEFAULT_WEIGHTS
            if os.path.exists(path):
                from ipercore_tpu.utils.checkpoint import load_params

                tree = load_params(path)
                inpaint_params = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(np.asarray(x), jnp.float32), tree)
        self.trained = trained or (inpaint_params is not None)
        s = control_size
        if inpaint_params is None:
            inpaint_params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, s, s, 4)))
        self.sr_trained = sr_params is not None
        if sr_params is None and os.path.exists(SR_DEFAULT_WEIGHTS):
            from ipercore_tpu.utils.checkpoint import load_params

            sr_params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x), jnp.float32),
                load_params(SR_DEFAULT_WEIGHTS))
            self.sr_trained = True
        if sr_params is None:
            sr_params = jax.jit(self.sr.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3)))
        self.inpaint_params = inpaint_params
        self.sr_params = sr_params
        self._inpaint = jax.jit(self.net.apply)
        self._sr = jax.jit(self.sr.apply)

    def run_inpainting(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) in [-1, 1]; mask: (H, W, 1) 1 = human region to remove.

        Returns: (H, W, 3) inpainted background — `run_inpainting:69`.
        """
        H, W = image.shape[:2]
        s = self.control_size
        img_c = resize_image(jnp.asarray(image), s, s)[None]
        mask_c = (resize_image(jnp.asarray(mask), s, s)[None] > 0.5).astype(jnp.float32)
        if self.trained:
            x = jnp.concatenate([img_c * (1 - mask_c), mask_c], axis=-1)
            out = self._inpaint(self.inpaint_params, x)
            out = img_c * (1 - mask_c) + out * mask_c
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
