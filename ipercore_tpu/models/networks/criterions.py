"""Training criterions: perceptual (VGG), face identity, LSGAN, TV, temporal.

Rebuilds `iPERCore/models/networks/criterions/` (vggloss.py:59-310,
faceloss.py:125-499, ganloss.py:13, generals.py:34-43) as functional JAX
losses. The perceptual/face feature extractors are flax modules with the same
layer topology as the torch originals, so converted torch weights drop in; when
no weights are supplied they run with fixed random filters (a documented
fallback — random multi-scale conv features are still a usable perceptual
metric for smoke training; see e.g. "On random weights and unsupervised
feature learning").
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.ops.sampling import resize_image
from ipercore_tpu.models.networks.blocks import PAD3


# ---------------------------------------------------------------------------
# VGG perceptual loss
# ---------------------------------------------------------------------------

_VGG19_SLICES = (
    (64, 64),                # relu1_2
    (128, 128),              # relu2_2
    (256, 256, 256, 256),    # relu3_4
    (512, 512, 512, 512),    # relu4_4
    (512, 512, 512, 512),    # relu5_4
)


class VGGFeatures(nn.Module):
    """VGG19-topology feature pyramid (5 slices) — `vggloss.py:59`.

    Input NHWC in [-1, 1]; internally renormalized with ImageNet statistics as
    the torch original does (`vggloss.py` normalize path).
    """

    slices: Sequence[Sequence[int]] = _VGG19_SLICES

    @nn.compact
    def __call__(self, x):
        # [-1, 1] -> [0, 1] -> ImageNet normalize
        x = (x + 1.0) * 0.5
        mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
        x = (x - mean) / std
        feats = []
        for si, widths in enumerate(self.slices):
            for wi, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=PAD3, name=f"conv{si}_{wi}")(x)
                x = nn.relu(x)
            feats.append(x)
            if si != len(self.slices) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


# weights per slice, `vggloss.py:310` ([1/32, 1/16, 1/8, 1/4, 1])
VGG_SLICE_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


def perceptual_loss(feat_params, apply_fn, pred: jnp.ndarray, target: jnp.ndarray,
                    weights: Sequence[float] = VGG_SLICE_WEIGHTS) -> jnp.ndarray:
    """Weighted L1 over feature slices; target features are stop-gradiented."""
    fp = apply_fn(feat_params, pred)
    ft = apply_fn(feat_params, jax.lax.stop_gradient(target))
    loss = 0.0
    for w, a, b in zip(weights, fp, ft):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss


# ---------------------------------------------------------------------------
# Face identity loss (SphereFace-20a topology, `faceloss.py:203`)
# ---------------------------------------------------------------------------


class SphereFaceFeatures(nn.Module):
    """Sphere20a feature trunk: 4 stages of strided conv + PReLU-ish residuals.

    Emits the per-stage activations used by the reference's 5-level L1 face
    loss (`faceloss.py:289-433`). Input: (N, 112, 96, 3).
    """

    @nn.compact
    def __call__(self, x):
        feats = []
        stage_specs = ((64, 1), (128, 2), (256, 4), (512, 1))
        for si, (width, n_res) in enumerate(stage_specs):
            x = nn.Conv(width, (3, 3), strides=(2, 2), padding=PAD3, name=f"stage{si}_down")(x)
            x = nn.leaky_relu(x, 0.25)
            for ri in range(n_res):
                h = nn.Conv(width, (3, 3), padding=PAD3, name=f"stage{si}_res{ri}_a")(x)
                h = nn.leaky_relu(h, 0.25)
                h = nn.Conv(width, (3, 3), padding=PAD3, name=f"stage{si}_res{ri}_b")(h)
                h = nn.leaky_relu(h, 0.25)
                x = x + h
            feats.append(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, name="fc5")(x)
        feats.append(x)
        return feats


def face_loss(face_params, apply_fn, pred: jnp.ndarray, target: jnp.ndarray,
              pred_bbox: jnp.ndarray | None = None,
              target_bbox: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1 over SphereFace feature levels of head crops — `faceloss.py:289`.

    Crops are (N, 4) normalized NDC bboxes; when None the full image is resized.
    """
    from ipercore_tpu.models.networks.discriminators import crop_by_bbox

    def prep(img, bbox):
        if bbox is not None:
            img = crop_by_bbox(img, bbox, (112, 96))
        else:
            img = resize_image(img, 112, 96)
        return img

    fp = apply_fn(face_params, prep(pred, pred_bbox))
    ft = apply_fn(face_params, prep(jax.lax.stop_gradient(target), target_bbox))
    loss = 0.0
    for a, b in zip(fp, ft):
        loss = loss + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss / len(fp)


# ---------------------------------------------------------------------------
# GAN / regularization losses
# ---------------------------------------------------------------------------


def lsgan_loss(outs: Sequence[jnp.ndarray], target: float) -> jnp.ndarray:
    """LSGAN mean((out - target)^2) averaged over heads — `ganloss.py:13-21`.

    The reference trains with real=1, fake=-1 (`lwg_trainer.py:791`)."""
    valid = [o for o in outs if o.size > 0]  # tiny crops can collapse to 0-size
    loss = 0.0
    for o in valid:
        loss = loss + jnp.mean((o - target) ** 2)
    return loss / max(len(valid), 1)


def tv_loss(mask: jnp.ndarray) -> jnp.ndarray:
    """Total-variation smoothness on NHWC maps — `generals.py:34`."""
    dh = jnp.mean(jnp.abs(mask[:, 1:] - mask[:, :-1]))
    dw = jnp.mean(jnp.abs(mask[:, :, 1:] - mask[:, :, :-1]))
    return dh + dw


def temporal_smooth_loss(frames: jnp.ndarray) -> jnp.ndarray:
    """L1 between consecutive frames (N, T, H, W, C) — `generals.py:43`."""
    return jnp.mean(jnp.abs(frames[:, 1:] - frames[:, :-1]))


def mask_bce_loss(pred_mask: jnp.ndarray, target_mask: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Binary cross-entropy on predicted attention masks (`lwg_trainer.py` BCE)."""
    p = jnp.clip(pred_mask, eps, 1.0 - eps)
    t = target_mask
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))
