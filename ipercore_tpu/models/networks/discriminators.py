"""Discriminator zoo: PatchGAN heads with global/body/head/background crops.

Rebuilds `iPERCore/models/networks/discriminators/patch_dis.py:185` and
`multi_scale_dis.py:47-332`. Crops are done with static-shape bilinear
grid-sampling of normalized bboxes instead of the reference's per-sample python
slicing (`multi_scale_dis.py:21-44`) — jit/vmap friendly and differentiable.
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.ops.sampling import grid_sample
from ipercore_tpu.models.networks.blocks import PAD3, instance_norm


def _cfg(cfg, key, default):
    if isinstance(cfg, Mapping):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def crop_by_bbox(imgs: jnp.ndarray, bboxes: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Crop + resize by normalized bboxes via grid sampling.

    Args:
        imgs: (N, H, W, C).
        bboxes: (N, 4) = (x0, y0, x1, y1) in [-1, 1] NDC.
        out_hw: static output (h, w).

    Returns:
        (N, h, w, C)
    """
    h, w = out_hw
    ys = (jnp.arange(h, dtype=imgs.dtype) + 0.5) / h  # (h,) in (0, 1)
    xs = (jnp.arange(w, dtype=imgs.dtype) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (h, w)
    x0, y0, x1, y1 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    sx = x0[:, None, None] + (x1 - x0)[:, None, None] * gx[None]
    sy = y0[:, None, None] + (y1 - y0)[:, None, None] * gy[None]
    grid = jnp.stack([sx, sy], axis=-1)  # (N, h, w, 2)
    return grid_sample(imgs, grid)


class PatchDiscriminator(nn.Module):
    """70x70-style PatchGAN — `patch_dis.py:185`: 4x4 stride-2 convs,
    LeakyReLU(0.2), instance norm from layer 2, 1-channel head."""

    ndf: int = 64
    n_layers: int = 4
    max_nf_mult: int = 8
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        kw, pad = 4, ((1, 1), (1, 1))
        x = nn.Conv(self.ndf, (kw, kw), strides=(2, 2), padding=pad)(x)
        x = nn.leaky_relu(x, 0.2)
        # middle convs keep a bias like the reference (`patch_dis.py:22-26`
        # only drops it for BatchNorm): the following instance norm cancels
        # it mathematically, but the parameter exists in torch checkpoints
        for n in range(1, self.n_layers):
            mult = min(2 ** n, self.max_nf_mult)
            x = nn.Conv(self.ndf * mult, (kw, kw), strides=(2, 2), padding=pad)(x)
            x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        mult = min(2 ** self.n_layers, self.max_nf_mult)
        x = nn.Conv(self.ndf * mult, (kw, kw), strides=(1, 1), padding=pad)(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (kw, kw), strides=(1, 1), padding=pad)(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x


class GlobalDiscriminator(nn.Module):
    """Whole-image head (+ optional aug-bg head) — `multi_scale_dis.py:47-107`."""

    cfg: Any
    use_aug_bg: bool = False

    def setup(self):
        kw = dict(
            ndf=_cfg(self.cfg, "ndf", 64), n_layers=_cfg(self.cfg, "n_layers", 4),
            max_nf_mult=_cfg(self.cfg, "max_nf_mult", 8),
            use_sigmoid=_cfg(self.cfg, "use_sigmoid", False),
        )
        self.global_model = PatchDiscriminator(**kw)
        if self.use_aug_bg:
            self.bg_model = PatchDiscriminator(**kw)

    def __call__(self, x, bg_x=None, body_bbox=None, head_bbox=None):
        outs = [self.global_model(x)]
        if self.use_aug_bg and bg_x is not None:
            outs.append(self.bg_model(bg_x))
        return outs


class GlobalLocalDiscriminator(nn.Module):
    """Global + body-crop heads — `multi_scale_dis.py:110-191`."""

    cfg: Any
    use_aug_bg: bool = False

    def setup(self):
        kw = dict(
            ndf=_cfg(self.cfg, "ndf", 64), n_layers=_cfg(self.cfg, "n_layers", 4),
            max_nf_mult=_cfg(self.cfg, "max_nf_mult", 8),
            use_sigmoid=_cfg(self.cfg, "use_sigmoid", False),
        )
        self.global_model = PatchDiscriminator(**kw)
        self.local_model = PatchDiscriminator(**kw)
        if self.use_aug_bg:
            self.bg_model = PatchDiscriminator(**kw)

    def __call__(self, x, bg_x=None, body_bbox=None, head_bbox=None):
        outs = [self.global_model(x)]
        if body_bbox is not None:
            h, w = x.shape[1] // 2, x.shape[2] // 2
            outs.append(self.local_model(crop_by_bbox(x, body_bbox, (h, w))))
        if self.use_aug_bg and bg_x is not None:
            outs.append(self.bg_model(bg_x))
        return outs


class GlobalBodyHeadDiscriminator(nn.Module):
    """Training default `patch_global_body_head` — `multi_scale_dis.py:194-284`:
    global + body-crop + head-crop (+ optional aug-bg) heads."""

    cfg: Any
    use_aug_bg: bool = False

    def setup(self):
        kw = dict(
            ndf=_cfg(self.cfg, "ndf", 64), n_layers=_cfg(self.cfg, "n_layers", 4),
            max_nf_mult=_cfg(self.cfg, "max_nf_mult", 8),
            use_sigmoid=_cfg(self.cfg, "use_sigmoid", False),
        )
        self.global_model = PatchDiscriminator(**kw)
        self.body_model = PatchDiscriminator(**kw)
        self.head_model = PatchDiscriminator(**kw)
        if self.use_aug_bg:
            self.bg_model = PatchDiscriminator(**kw)

    def __call__(self, x, bg_x=None, body_bbox=None, head_bbox=None):
        outs = [self.global_model(x)]
        if body_bbox is not None:
            h, w = x.shape[1] // 2, x.shape[2] // 2
            outs.append(self.body_model(crop_by_bbox(x, body_bbox, (h, w))))
        if head_bbox is not None:
            h, w = x.shape[1] // 4, x.shape[2] // 4
            outs.append(self.head_model(crop_by_bbox(x, head_bbox, (h, w))))
        if self.use_aug_bg and bg_x is not None:
            outs.append(self.bg_model(bg_x))
        return outs


class MultiScaleDiscriminator(nn.Module):
    """2-scale image pyramid of PatchGANs — `multi_scale_dis.py:287-332`."""

    cfg: Any
    n_scales: int = 2

    def setup(self):
        kw = dict(
            ndf=_cfg(self.cfg, "ndf", 64), n_layers=_cfg(self.cfg, "n_layers", 4),
            max_nf_mult=_cfg(self.cfg, "max_nf_mult", 8),
            use_sigmoid=_cfg(self.cfg, "use_sigmoid", False),
        )
        # named `scale_models` for 1:1 torch-checkpoint key parity
        # (`multi_scale_dis.py:293-303`)
        self.scale_models = [PatchDiscriminator(**kw) for _ in range(self.n_scales)]

    def __call__(self, x, bg_x=None, body_bbox=None, head_bbox=None):
        outs = []
        cur = x
        for i, m in enumerate(self.scale_models):
            outs.append(m(cur))
            if i != self.n_scales - 1:
                cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        return outs


DISCRIMINATOR_REGISTRY = {
    "patch": GlobalDiscriminator,
    "patch_global": GlobalDiscriminator,
    "patch_global_local": GlobalLocalDiscriminator,
    "patch_global_body_head": GlobalBodyHeadDiscriminator,
    "multi_scale": MultiScaleDiscriminator,
}


def build_discriminator(name: str, cfg, use_aug_bg: bool = False) -> nn.Module:
    """NetworksFactory parity for discriminators (`networks/__init__.py`)."""
    if name not in DISCRIMINATOR_REGISTRY:
        raise KeyError(f"unknown discriminator {name!r}; have {sorted(DISCRIMINATOR_REGISTRY)}")
    cls = DISCRIMINATOR_REGISTRY[name]
    if cls is MultiScaleDiscriminator:
        return cls(cfg=cfg)
    return cls(cfg=cfg, use_aug_bg=use_aug_bg)
