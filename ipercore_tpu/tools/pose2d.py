"""2D pose estimation: OpenPose Body-25 in flax (NHWC) + decoding.

Rebuilds `iPERCore/tools/human_pose2d_estimators/openpose/` — the Body-25
network (`models/openposenet.py:178`, VGG-ish backbone + multi-stage PAF +
heatmap heads) and the fast single-scale decode (`post_process.py` infer_fast:
heatmap NMS -> peak coords). Weight conversion from the torch checkpoint uses
`ipercore_tpu.utils.checkpoint.convert_torch_state_dict`.

Two decode paths:
  * `decode_single_person` — per-joint argmax, the fast path when one person
    is guaranteed (the tracked crop);
  * `OpenPoseRunner.run_tracked` — full heatmap NMS + greedy PAF grouping +
    largest-person pick + 1-euro temporal filter
    (`ipercore_tpu.tools.pose2d_decode`, parity with `post_process.py:94-300`
    and `utils/one_euro_filter.py`).
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.models.networks.blocks import PAD3

N_BODY25_JOINTS = 25
N_BODY25_PAFS = 52

# Body-25 left<->right joint swap (horizontal-flip test-time augmentation):
# 2-4 R arm <-> 5-7 L arm, 9-11 R leg <-> 12-14 L leg, 15/16 eyes, 17/18
# ears, 19-21 L foot <-> 22-24 R foot; 0/1/8 are midline. Channel 25 = bg.
BODY25_FLIP_JOINTS = np.asarray(
    [0, 1, 5, 6, 7, 2, 3, 4, 8, 12, 13, 14, 9, 10, 11,
     16, 15, 18, 17, 22, 23, 24, 19, 20, 21, 25], np.int32)


def _body25_paf_flip_tables():
    """(perm, sign) over the 52 PAF channels for horizontal flip: channel c
    of the flip-TTA output reads sign[c] * flip_x(paf[..., perm[c]]) — the
    mirrored limb's field, with the x-component negated."""
    from ipercore_tpu.tools.pose2d_decode import BODY25_LIMBS, BODY25_PAF_IDS

    swap = {int(a): int(b) for a, b in
            zip(BODY25_FLIP_JOINTS[:25], range(25)) if a != b}
    perm = np.arange(N_BODY25_PAFS, dtype=np.int32)
    sign = np.ones(N_BODY25_PAFS, np.float32)
    for i, (ja, jb) in enumerate(BODY25_LIMBS):
        mirror = (swap.get(ja, ja), swap.get(jb, jb))
        m = BODY25_LIMBS.index(mirror)
        cx, cy = BODY25_PAF_IDS[i]
        mcx, mcy = BODY25_PAF_IDS[m]
        perm[cx], perm[cy] = mcx, mcy
        sign[cx] = -1.0
    return perm, sign


class ChannelPReLU(nn.Module):
    """Per-channel PReLU with torch's parameter name ('weight')."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, a * x)


class OpenPoseStem(nn.Module):
    """model0 — VGG stem + CPM convs with PReLU tails
    (`openposenet.py:247-276` build_model0). Layer names match the torch
    checkpoint keys ('model0.conv1_1.weight', ...)."""

    @nn.compact
    def __call__(self, x):
        def c(name, width):
            return nn.Conv(width, (3, 3), padding=PAD3, name=name)

        x = nn.relu(c("conv1_1", 64)(x))
        x = nn.relu(c("conv1_2", 64)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(c("conv2_1", 128)(x))
        x = nn.relu(c("conv2_2", 128)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(c("conv3_1", 256)(x))
        x = nn.relu(c("conv3_2", 256)(x))
        x = nn.relu(c("conv3_3", 256)(x))
        x = nn.relu(c("conv3_4", 256)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(c("conv4_1", 512)(x))
        x = ChannelPReLU(512, name="prelu4_2")(c("conv4_2", 512)(x))
        x = ChannelPReLU(256, name="prelu4_3_CPM")(c("conv4_3_CPM", 256)(x))
        x = ChannelPReLU(128, name="prelu4_4_CPM")(c("conv4_4_CPM", 128)(x))
        return x


class StackMConv(nn.Module):
    """One OpenPose-1.5 refinement stage: 5 dense triple-MConv blocks +
    1x1 squeeze + 1x1 head (`openposenet.py:60-170` MConvBlock/StackMConvBlock).

    Parameter names mirror the torch checkpoint ('Mconv{i}_stage{s}_L{l}_{col}'
    and 'Mprelu...'), flattened one level (torch nests them under
    main.{i}.split{col}; name uniqueness makes the flat layout unambiguous).
    """

    stage: int
    l_name: int
    mid: int          # 96 (stage 0) or 128 (later stages)
    out_channels: int  # 52 PAFs (L2) / 26 heatmaps (L1)

    @nn.compact
    def __call__(self, x):
        s, l = self.stage, self.l_name

        def triple(x, i):
            outs = []
            h = x
            for col in range(3):
                h = nn.Conv(self.mid, (3, 3), padding=PAD3,
                            name=f"Mconv{i}_stage{s}_L{l}_{col}")(h)
                h = ChannelPReLU(self.mid, name=f"Mprelu{i}_stage{s}_L{l}_{col}")(h)
                outs.append(h)
            return jnp.concatenate(outs, axis=-1)

        for i in range(1, 6):
            x = triple(x, i)
        squeeze = 256 if self.mid == 96 else 512
        x = nn.Conv(squeeze, (1, 1), name=f"Mconv6_stage{s}_L{l}")(x)
        x = ChannelPReLU(squeeze, name=f"Mprelu6_stage{s}_L{l}")(x)
        return nn.Conv(self.out_channels, (1, 1), name=f"Mconv7_stage{s}_L{l}")(x)


class OpenPoseBody25(nn.Module):
    """Body-25 OpenPose 1.5: model0 stem -> 4 PAF (L2) stages -> 2 heatmap
    (L1) stages with dense MConv blocks — exact architecture of
    `openposenet.py:178-330`, so the published body25 checkpoint converts
    key-for-key (`torch_convert.convert_openpose`)."""

    @nn.compact
    def __call__(self, x, return_stages: bool = False):
        """x: (N, H, W, 3) in [-0.5, 0.5]. Returns (pafs, heatmaps) at H/8.

        `return_stages=True` additionally returns every stage's output
        (4 PAF + 2 heatmap tensors) for deep supervision during training —
        the reference trains with per-stage losses (standard CMU recipe)."""
        feat = OpenPoseStem(name="model0")(x)
        pafs, hms = [], []
        paf = StackMConv(0, 2, 96, N_BODY25_PAFS, name="block02")(feat)
        pafs.append(paf)
        paf = StackMConv(1, 2, 128, N_BODY25_PAFS, name="block12")(
            jnp.concatenate([feat, paf], axis=-1))
        pafs.append(paf)
        paf = StackMConv(2, 2, 128, N_BODY25_PAFS, name="block22")(
            jnp.concatenate([feat, paf], axis=-1))
        pafs.append(paf)
        paf = StackMConv(3, 2, 128, N_BODY25_PAFS, name="block32")(
            jnp.concatenate([feat, paf], axis=-1))
        pafs.append(paf)
        hm = StackMConv(0, 1, 96, N_BODY25_JOINTS + 1, name="block01")(
            jnp.concatenate([feat, paf], axis=-1))
        hms.append(hm)
        hm = StackMConv(1, 1, 128, N_BODY25_JOINTS + 1, name="block11")(
            jnp.concatenate([feat, paf, hm], axis=-1))
        hms.append(hm)
        if return_stages:
            return paf, hm, pafs, hms
        return paf, hm


def decode_single_person(heatmaps: jnp.ndarray, threshold: float = 0.1,
                         n_joints: int = None):
    """Argmax + sub-pixel decode per joint (single-person) — role of
    `post_process.py` NMS + grouping for the tracked person. Sub-pixel
    refinement is a 3x3 center-of-mass around the peak (a gaussian peak's
    COM recovers the off-grid center; the stride-8 heatmap grid alone
    quantizes to ~4px at 224).

    Args:
        heatmaps: (N, h, w, J+1); the last channel is background.

    Returns:
        kps: (N, J, 2) x,y in [-1, 1] NDC; scores (N, J).
    """
    hm = heatmaps[..., :(n_joints or N_BODY25_JOINTS)]
    N, h, w, J = hm.shape
    flat = hm.reshape(N, h * w, J)
    idx = jnp.argmax(flat, axis=1)  # (N, J)
    scores = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0]  # (N, J)
    ys = (idx // w).astype(jnp.int32)
    xs = (idx % w).astype(jnp.int32)

    # 3x3 COM refinement on the zero-padded heatmap (peak at a border keeps
    # its in-bounds neighbours only)
    pad = jnp.pad(hm, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flatp = pad.reshape(N, (h + 2) * (w + 2), J)
    num_x = jnp.zeros_like(scores)
    num_y = jnp.zeros_like(scores)
    den = jnp.zeros_like(scores)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nidx = (ys + 1 + dy) * (w + 2) + (xs + 1 + dx)
            v = jnp.take_along_axis(flatp, nidx[:, None, :], axis=1)[:, 0]
            v = jnp.maximum(v, 0.0)
            num_x = num_x + v * dx
            num_y = num_y + v * dy
            den = den + v
    off_x = jnp.clip(num_x / jnp.maximum(den, 1e-6), -1.0, 1.0)
    off_y = jnp.clip(num_y / jnp.maximum(den, 1e-6), -1.0, 1.0)

    x_ndc = (2.0 * (xs.astype(jnp.float32) + off_x) + 1.0 - w) / w
    y_ndc = (2.0 * (ys.astype(jnp.float32) + off_y) + 1.0 - h) / h
    kps = jnp.stack([x_ndc, y_ndc], axis=-1)
    valid = scores > threshold
    return kps, scores, valid


OPENPOSE_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "openpose.npz")


class OpenPoseRunner:
    """Batched jitted runner — role of `OpenPoseRunner` (`runner.py:71-206`).

    Without explicit params, weights trained on procedural SMPL renders
    (scripts/train_openpose.py) auto-load from `assets/openpose.npz` when
    present; converted torch checkpoints can be supplied as `params`."""

    def __init__(self, params=None, input_size: int = 368,
                 weights_path: str = None, tta: bool = True):
        self.net = OpenPoseBody25()
        self.input_size = input_size
        self.trained = params is not None
        # the FCN runs at any resolution but is scale-calibrated to the one
        # it trained at; trainers stamp it into the checkpoint and consumers
        # (preprocessor crops, eval) feed it back
        self.trained_size = None
        if params is None:
            params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)))
            path = weights_path or OPENPOSE_DEFAULT_WEIGHTS
            if os.path.exists(path):
                from ipercore_tpu.utils.checkpoint import load_params

                params = load_params(path, like=params)
                self.trained = True
                with np.load(path) as z:
                    if "__meta__/input_size" in z.files:
                        self.trained_size = int(z["__meta__/input_size"])
        self.params = params
        self.tta = tta
        self._apply = jax.jit(self.net.apply)
        if tta:
            perm, sign = _body25_paf_flip_tables()

            def apply_tta(p, x):
                # one program over [x; flip(x)]: average the original heads
                # with the un-flipped mirrored heads (channel-swapped joints,
                # mirrored limb PAFs with negated x-components)
                n = x.shape[0]
                paf, hm = self.net.apply(p, jnp.concatenate(
                    [x, x[:, :, ::-1, :]], axis=0))
                hm_f = hm[n:, :, ::-1, :][..., BODY25_FLIP_JOINTS]
                paf_f = paf[n:, :, ::-1, :][..., perm] * sign
                return 0.5 * (paf[:n] + paf_f), 0.5 * (hm[:n] + hm_f)

            self._apply = jax.jit(apply_tta)

    def _forward(self, images: np.ndarray, batch_size: int = 32):
        """Chunked net forward: one jitted program per fixed batch shape —
        running a whole driving clip (hundreds of frames) through a single
        giant jit blows HBM on activation buffers (observed: 438-frame clip
        at preprocess time)."""
        n = len(images)
        bs = min(batch_size, n)
        pafs, hms = [], []
        for i in range(0, n, bs):
            x = np.asarray(images[i:i + bs], np.float32)
            pad = bs - len(x)  # pad the tail chunk: one compiled shape total
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            paf, hm = self._apply(self.params, jnp.asarray(x) * 0.5)
            pafs.append(np.asarray(paf[:bs - pad]))
            hms.append(np.asarray(hm[:bs - pad]))
        return np.concatenate(pafs), np.concatenate(hms)

    def run(self, images: np.ndarray):
        """images: (N, H, W, 3) in [-1, 1]. Returns kps (N, 25, 2), scores."""
        _, hm = self._forward(images)
        kps, scores, valid = decode_single_person(jnp.asarray(hm))
        return np.asarray(kps), np.asarray(scores), np.asarray(valid)

    def run_tracked(self, images: np.ndarray, smooth: bool = True):
        """Correct path for multi-person frames — `run_over_folder`
        (`runner.py:207`): full NMS + PAF grouping per frame, largest-person
        pick, optional 1-euro temporal filter. Falls back to the argmax decode
        per-frame when grouping finds nobody.

        Returns the same (kps, scores, valid) contract as `run` (NDC coords).
        """
        from ipercore_tpu.tools.pose2d_decode import (
            OneEuroFilter, decode_multi_person, pick_largest_person)

        paf_n, hm_n = self._forward(images)
        kps_a, scores_a, valid_a = decode_single_person(jnp.asarray(hm_n))
        kps_a, scores_a = np.asarray(kps_a), np.asarray(scores_a)

        h, w = hm_n.shape[1:3]
        out_kps = np.array(kps_a)
        out_scores = np.array(scores_a)
        filt = OneEuroFilter() if smooth else None
        for i in range(len(hm_n)):
            people = decode_multi_person(hm_n[i], paf_n[i])
            best = pick_largest_person(people)
            if best is not None:
                px = best["kps"]  # (25, 2) pixel coords, NaN missing
                ndc = np.stack([(2 * px[:, 0] + 1 - w) / w,
                                (2 * px[:, 1] + 1 - h) / h], axis=1)
                take = np.isfinite(ndc[:, 0])
                out_kps[i][take] = ndc[take]
                out_scores[i][take] = best["scores"][take]
            if filt is not None:
                out_kps[i] = filt(out_kps[i])
        valid = out_scores > 0.1
        return out_kps.astype(np.float32), out_scores, valid

    def run_tracked_robust(self, images: np.ndarray, smooth: bool = True):
        """`run_tracked` + degenerate-decode recovery via jittered re-crops.

        When PAF grouping finds nobody, `run_tracked` silently falls back
        to the per-joint heatmap argmax; on a barely-out-of-domain photo the
        heatmaps are near-flat and every joint lands grid-quantized on the
        crop midline with healthy-looking scores — measured on the bundled
        real still (r5): all 25 joints at |x| <= 0.03 while a 10%-different
        framing of the SAME photo decodes fine. This wrapper detects that
        degeneracy (no lateral structure across confident joints) and
        retries the frame over scale/shift jittered crops, keeping the
        first non-degenerate decode (best mean confidence among them).
        Same contract as `run_tracked`.
        """
        kps, scores, valid = self.run_tracked(images, smooth=smooth)
        for i in range(len(images)):
            if not _degenerate_decode(kps[i], scores[i] * valid[i]):
                continue
            best = None
            for s, dx, dy in ((0.8, 0.0, 0.0), (1.25, 0.0, 0.0),
                              (0.9, 0.1, 0.0), (0.9, -0.1, 0.0),
                              (1.1, 0.0, 0.1), (1.1, 0.0, -0.1)):
                crop = _affine_window(images[i], s, dx, dy)
                k1, s1, v1 = self.run_tracked(crop[None], smooth=False)
                k1 = k1[0] * s + np.asarray([dx, dy], np.float32)
                c1 = (s1 * v1)[0]
                if _degenerate_decode(k1, c1):
                    continue
                m = float(c1.mean())
                if best is None or m > best[0]:
                    best = (m, k1, s1[0], v1[0])
            if best is not None:
                kps[i], scores[i], valid[i] = best[1], best[2], best[3]
        return kps, scores, valid


def _degenerate_decode(kps: np.ndarray, conf: np.ndarray,
                       conf_thr: float = 0.3) -> bool:
    """True when a Body-25 decode has no lateral structure — the signature
    of the flat-heatmap argmax fallback (all joints on the crop midline).
    A real single-person decode spreads confident joints over >~7% of NDC
    in x (shoulders alone span ~0.15 at production framings)."""
    sel = conf > conf_thr
    if sel.sum() < 4:
        return True
    x = kps[sel, 0]
    y = kps[sel, 1]
    return bool(x.std() < 0.035 or (y.max() - y.min()) < 0.15)


def _affine_window(image: np.ndarray, s: float, dx: float, dy: float) -> np.ndarray:
    """Resample a square window of NDC side 2*s centered at (dx, dy) back to
    the input resolution (grey padding outside) — the jitter crops of
    `run_tracked_robust`. A point at window NDC u maps to image NDC
    u*s + (dx, dy)."""
    H, W = image.shape[:2]
    # window corners in pixels
    x0 = (dx - s + 1.0) * 0.5 * W
    y0 = (dy - s + 1.0) * 0.5 * H
    side_x, side_y = s * W, s * H
    xi, yi = int(round(max(x0, 0))), int(round(max(y0, 0)))
    xj = int(round(min(x0 + side_x, W)))
    yj = int(round(min(y0 + side_y, H)))
    oh, ow = int(round(side_y)), int(round(side_x))
    out = np.zeros((oh, ow) + image.shape[2:], image.dtype)
    dy0, dx0 = yi - int(round(y0)), xi - int(round(x0))
    h = max(0, min(yj - yi, oh - dy0))
    w = max(0, min(xj - xi, ow - dx0))
    out[dy0:dy0 + h, dx0:dx0 + w] = image[yi:yi + h, xi:xi + w]
    import jax
    import jax.numpy as jnp

    return np.asarray(jax.image.resize(jnp.asarray(out), (H, W) + image.shape[2:],
                                       "linear"))


# Body-25 -> cocoplus-19 joint mapping (role of the keypoint formatters,
# `smplify/utils/geometry/keypoints.py:116-406`); -1 = missing.
BODY25_TO_COCOPLUS19 = np.asarray(
    [11, 10, 9, 12, 13, 14, 4, 3, 2, 5, 6, 7, 1, 0, 17, 15, 18, 16, 8],
    np.int32,
)


def body25_to_cocoplus(kps: np.ndarray, scores: np.ndarray):
    """Map Body-25 keypoints to the 19-joint cocoplus convention."""
    m = BODY25_TO_COCOPLUS19
    return kps[..., m, :], scores[..., m]


def build_pose2d_estimator(name: str = "openpose_body25", **kw):
    """Builder parity with `build_pose2d_estimator` (`preprocessors.py:9-13`):
    "openpose_body25" (default, `deploy.toml:158`) or "mobilenet" (the
    lightweight COCO-18 variant, `openpose/models/mobilenet.py`)."""
    if name in ("openpose_body25", "openpose", "body25"):
        return OpenPoseRunner(**kw)
    if name in ("mobilenet", "lightweight"):
        from ipercore_tpu.tools.pose2d_mobilenet import MobilenetOpenPoseRunner

        return MobilenetOpenPoseRunner(**kw)
    raise KeyError(f"unknown pose2d estimator {name!r}")
