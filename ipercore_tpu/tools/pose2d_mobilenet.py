"""Lightweight Mobilenet OpenPose (COCO-18) — the reference's fast 2D-pose
variant.

Rebuilds `iPERCore/tools/human_pose2d_estimators/openpose/models/mobilenet.py`
(Osokin's lightweight-human-pose-estimation): a MobileNet-v1 trunk (depthwise
separable convs, dilated tail), a CPM alignment head, one initial + N
refinement stages each emitting 19 heatmaps + 38 PAFs. Inference-mode
BatchNorm (FrozenBN) so the published `checkpoint_iter_370000.pth` converts
layer-for-layer (`utils/torch_convert.convert_mobilenet_openpose`).

The decode path is shared with Body-25 (`tools.pose2d_decode`); COCO-18
keypoints map to SMPL slots via `utils.keypoints` formatters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.models.networks.blocks import PAD3, FrozenBatchNorm as FrozenBN

N_COCO_HEATMAPS = 19  # 18 joints + background
N_COCO_PAFS = 38


class ConvDW(nn.Module):
    """Depthwise-separable conv + BN + ReLU pairs — `mobilenet.py:17-26`."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        x = nn.Conv(x.shape[-1], (3, 3), strides=(self.stride,) * 2,
                    padding=((d, d), (d, d)), kernel_dilation=(d, d),
                    feature_group_count=x.shape[-1], use_bias=False,
                    name="dw")(x)
        x = nn.relu(FrozenBN(x.shape[-1], name="dwbn")(x))
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="pw")(x)
        return nn.relu(FrozenBN(self.features, name="pwbn")(x))


class ConvDWNoBN(nn.Module):
    """Depthwise-separable conv with ELU, no BN — `mobilenet.py:29-36`."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (3, 3), padding=PAD3,
                    feature_group_count=x.shape[-1], use_bias=False,
                    name="dw")(x)
        x = nn.elu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="pw")(x)
        return nn.elu(x)


class Cpm(nn.Module):
    """CPM alignment head — `mobilenet.py:39-53`."""

    features: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.features, (1, 1), name="align")(x))
        t = x
        for i in range(3):
            t = ConvDWNoBN(self.features, name=f"trunk{i}")(t)
        return nn.relu(nn.Conv(self.features, (3, 3), padding=PAD3,
                               name="conv")(x + t))


class InitialStage(nn.Module):
    """`mobilenet.py:56-78`."""

    features: int = 128
    n_heatmaps: int = N_COCO_HEATMAPS
    n_pafs: int = N_COCO_PAFS

    @nn.compact
    def __call__(self, x):
        t = x
        for i in range(3):
            t = nn.relu(nn.Conv(self.features, (3, 3), padding=PAD3,
                                name=f"trunk{i}")(t))
        hm = nn.relu(nn.Conv(512, (1, 1), name="hm0")(t))
        hm = nn.Conv(self.n_heatmaps, (1, 1), name="hm1")(hm)
        paf = nn.relu(nn.Conv(512, (1, 1), name="paf0")(t))
        paf = nn.Conv(self.n_pafs, (1, 1), name="paf1")(paf)
        return hm, paf


class RefinementBlock(nn.Module):
    """`mobilenet.py:81-94` — 1x1 align + two BN'd 3x3 convs (second dilated
    2), residual. The trunk convs keep the reference's default `bn=True`."""

    features: int = 128

    @nn.compact
    def __call__(self, x):
        init = nn.relu(nn.Conv(self.features, (1, 1), name="initial")(x))
        t = nn.Conv(self.features, (3, 3), padding=PAD3, name="trunk0")(init)
        t = nn.relu(FrozenBN(self.features, name="trunk0_bn")(t))
        t = nn.Conv(self.features, (3, 3), padding=((2, 2), (2, 2)),
                    kernel_dilation=(2, 2), name="trunk1")(t)
        t = nn.relu(FrozenBN(self.features, name="trunk1_bn")(t))
        return init + t


class RefinementStage(nn.Module):
    """`mobilenet.py:97-119`."""

    features: int = 128
    n_heatmaps: int = N_COCO_HEATMAPS
    n_pafs: int = N_COCO_PAFS

    @nn.compact
    def __call__(self, x):
        for b in range(5):
            x = RefinementBlock(self.features, name=f"block{b}")(x)
        hm = nn.relu(nn.Conv(self.features, (1, 1), name="hm0")(x))
        hm = nn.Conv(self.n_heatmaps, (1, 1), name="hm1")(hm)
        paf = nn.relu(nn.Conv(self.features, (1, 1), name="paf0")(x))
        paf = nn.Conv(self.n_pafs, (1, 1), name="paf1")(paf)
        return hm, paf


class MobilenetOpenPose(nn.Module):
    """`PoseEstimationWithMobileNet` (`mobilenet.py:122-158`).

    Input (N, H, W, 3); returns the LAST stage's (heatmaps, pafs) at H/8.
    """

    num_refinement_stages: int = 1
    features: int = 128

    # (out_channels, stride, dilation) per MobileNet block after the stem
    TRUNK = ((64, 1, 1), (128, 2, 1), (128, 1, 1), (256, 2, 1), (256, 1, 1),
             (512, 1, 1), (512, 1, 2), (512, 1, 1), (512, 1, 1), (512, 1, 1),
             (512, 1, 1))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=PAD3, use_bias=False,
                    name="model0_conv")(x)
        x = nn.relu(FrozenBN(32, name="model0_bn")(x))
        for i, (width, stride, dil) in enumerate(self.TRUNK, start=1):
            x = ConvDW(width, stride, dil, name=f"model{i}")(x)
        feats = Cpm(self.features, name="cpm")(x)
        hm, paf = InitialStage(self.features, name="initial_stage")(feats)
        for r in range(self.num_refinement_stages):
            rin = jnp.concatenate([feats, hm, paf], axis=-1)
            hm, paf = RefinementStage(self.features, name=f"refine{r}")(rin)
        return hm, paf
