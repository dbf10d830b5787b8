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

import os

import numpy as np
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


# COCO-18 joint id -> Body-25 slot (Body-25 8 = mid-hip has no COCO joint;
# the runner synthesizes it from the two hips) — lets Mobilenet results flow
# through the same `body25_to_cocoplus` formatter as the default estimator.
COCO18_TO_BODY25_SLOT = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18], np.int32)

MOBILENET_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "mobilenet_openpose.npz")


class MobilenetOpenPoseRunner:
    """Batched jitted runner for the lightweight variant — same (kps, scores,
    valid) Body-25-slot contract as `pose2d.OpenPoseRunner.run`, so either
    estimator drops into preprocessing stage 1.3 unchanged.

    Normalization follows the published checkpoint's recipe ((pix-128)/256,
    BGR): our [-1, 1] RGB inputs map to it as `x[..., ::-1] * 0.5`. Trained
    weights (scripts/train_openpose.py --arch mobilenet) auto-load from
    `assets/mobilenet_openpose.npz`; converted torch checkpoints
    (`torch_convert.convert_mobilenet_openpose`) can be passed as `params`.
    """

    def __init__(self, params=None, input_size: int = 256,
                 weights_path: str = None):
        self.net = MobilenetOpenPose()
        self.input_size = input_size
        self.trained = params is not None
        if params is None:
            params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)))
            path = weights_path or MOBILENET_DEFAULT_WEIGHTS
            if os.path.exists(path):
                from ipercore_tpu.utils.checkpoint import load_params

                params = load_params(path, like=params)
                self.trained = True
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def _to_body25(self, kps18, scores18):
        """(…, 18, 2)/(…, 18) COCO -> (…, 25, 2)/(…, 25) Body-25 slots."""
        N = kps18.shape[0]
        kps = np.zeros((N, 25, 2), np.float32)
        scores = np.zeros((N, 25), np.float32)
        kps[:, COCO18_TO_BODY25_SLOT] = kps18
        scores[:, COCO18_TO_BODY25_SLOT] = scores18
        both = np.minimum(scores[:, 9], scores[:, 12])
        kps[:, 8] = 0.5 * (kps[:, 9] + kps[:, 12])
        scores[:, 8] = both
        return kps, scores

    def run(self, images: np.ndarray):
        """images: (N, H, W, 3) in [-1, 1]. Returns kps (N, 25, 2) NDC,
        scores (N, 25), valid (N, 25)."""
        from ipercore_tpu.tools.pose2d import decode_single_person

        x = jnp.asarray(images)[..., ::-1] * 0.5
        hm, _ = self._apply(self.params, x)
        kps18, scores18, _ = decode_single_person(hm, n_joints=18)
        kps, scores = self._to_body25(np.asarray(kps18), np.asarray(scores18))
        return kps, scores, scores > 0.1

    def run_tracked(self, images: np.ndarray, smooth: bool = True):
        """Multi-person-safe decode (NMS + PAF grouping + 1-euro), COCO-18
        topology — mirror of `pose2d.OpenPoseRunner.run_tracked`."""
        from ipercore_tpu.tools.pose2d import decode_single_person
        from ipercore_tpu.tools.pose2d_decode import (
            COCO18_LIMBS, COCO18_PAF_IDS, OneEuroFilter, decode_multi_person,
            pick_largest_person)

        x = jnp.asarray(images)[..., ::-1] * 0.5
        hm, paf = self._apply(self.params, x)
        hm_n, paf_n = np.asarray(hm), np.asarray(paf)
        kps18, scores18, _ = decode_single_person(hm, n_joints=18)
        kps18, scores18 = np.asarray(kps18), np.array(np.asarray(scores18))
        kps18 = np.array(kps18)

        h, w = hm_n.shape[1:3]
        filt = OneEuroFilter() if smooth else None
        for i in range(len(hm_n)):
            people = decode_multi_person(hm_n[i], paf_n[i], limbs=COCO18_LIMBS,
                                         paf_ids=COCO18_PAF_IDS, n_joints=18)
            best = pick_largest_person(people)
            if best is not None:
                px = best["kps"]  # (18, 2) pixel coords, NaN missing
                ndc = np.stack([(2 * px[:, 0] + 1 - w) / w,
                                (2 * px[:, 1] + 1 - h) / h], axis=1)
                take = np.isfinite(ndc[:, 0])
                kps18[i][take] = ndc[take]
                scores18[i][take] = best["scores"][take]
            if filt is not None:
                kps18[i] = filt(kps18[i])
        kps, scores = self._to_body25(kps18, scores18)
        return kps, scores, scores > 0.1
