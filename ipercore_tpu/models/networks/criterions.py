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

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.ops.sampling import resize_image
from ipercore_tpu.models.networks.blocks import PAD3, FrozenBatchNorm


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


# VGG16 / VGG11 slice layouts (`vggloss.py:120-258`): the same 5-block
# pyramid with the torchvision conv counts of each architecture.
_VGG16_SLICES = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
_VGG11_SLICES = ((64,), (128,), (256, 256), (512, 512), (512, 512))

_VGG_SLICES_BY_TYPE = {
    "VGG19": _VGG19_SLICES, "VGG16": _VGG16_SLICES, "VGG11": _VGG11_SLICES}


def build_vgg(vgg_type: str = "VGG19") -> VGGFeatures:
    """Perceptual feature net by config name — `VGGLoss.__init__`
    (`vggloss.py:262-270`) dispatches VGG19/VGG16/VGG11 the same way."""
    return VGGFeatures(slices=_VGG_SLICES_BY_TYPE[vgg_type])


# weights per slice, `vggloss.py:310` ([1/32, 1/16, 1/8, 1/4, 1])
VGG_SLICE_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)

# On-device-trained perceptual weights (scripts/train_vgg.py: the VGG19
# pyramid supervised on body-part segmentation over procedural renders) —
# the no-network stand-in for the torchvision ImageNet VGG19 the reference
# downloads (`vggloss.py:59`). Converted torch weights drop into the same
# file layout via `torch_convert.convert_vgg19`.
DEFAULT_VGG_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))),
    "assets", "vgg_perceptual.npz")


def init_vgg_params(rng, image_size: int, weights_path: str = None,
                    net: "VGGFeatures" = None):
    """VGGFeatures params: trained checkpoint when present, else random init.

    The shipped `assets/vgg_perceptual.npz` matches the VGG19 slice layout;
    VGG16/VGG11 variants (pass `net=build_vgg(...)`) load only from an
    explicitly supplied `weights_path`."""
    if net is None:
        net = VGGFeatures()
    path = weights_path or (
        DEFAULT_VGG_WEIGHTS if tuple(net.slices) == _VGG19_SLICES else None)
    params = jax.jit(net.init)(rng, jnp.zeros((1, image_size, image_size, 3)))
    if path and os.path.exists(path):
        from ipercore_tpu.utils.checkpoint import load_params

        params = load_params(path, like=params)
    return params


class LPIPSLin(nn.Module):
    """LPIPS(lin) over the VGG16 pyramid — the published perceptual metric
    (reference protocol `docs/evaluate.md:4-11`).

    Construction matches the official `lpips.LPIPS(net='vgg')`: the input
    scaling layer there (shift [-.030,-.088,-.188], scale [.458,.448,.450])
    is algebraically the ImageNet normalization of [-1,1] inputs that
    `VGGFeatures` already applies; features at relu{1_2,2_2,3_3,4_3,5_3}
    (= our 5 slice taps) are channel-unit-normalized, passed through learned
    1x1 no-bias convs (`lin{k}`), spatially averaged and summed. Converted
    official weights drop in via `torch_convert.convert_lpips` ->
    `assets/lpips_vgg.npz`; without them `services.evaluate` reports the
    honest `lpips_proxy` instead.
    """

    @nn.compact
    def __call__(self, a, b):
        """a, b: (N, H, W, 3) in [-1, 1] -> (N,) LPIPS distance."""
        vgg = VGGFeatures(slices=_VGG16_SLICES, name="vgg")
        fa = vgg(a)
        fb = vgg(b)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa ** 2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb ** 2, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


DEFAULT_FACELOSS_WEIGHTS = os.path.join(
    os.path.dirname(DEFAULT_VGG_WEIGHTS), "faceloss.npz")


def init_face_params(rng, face_loss_path: str = "sphere20a"):
    """Face net + params by config path — `FaceLoss.__init__`
    (`faceloss.py:291-311`). Loads `.npz` weights when the path exists
    (converted torch checkpoints via `torch_convert.convert_sphereface` /
    `convert_senet50`). For the symbolic "sphere20a" name, the on-device
    identity-contrastive checkpoint `assets/faceloss.npz`
    (scripts/train_faceloss.py) auto-loads when shipped — the reference's
    FaceLoss always runs downloaded pretrained features
    (`faceloss.py:291-299`); random features were the r4 stopgap.

    Returns (module, params, (height, width))."""
    net, hw = build_face_net(face_loss_path)
    params = jax.jit(net.init)(rng, jnp.zeros((1, hw[0], hw[1], 3)))
    path = None
    name = os.path.basename(str(face_loss_path)).lower()
    if face_loss_path and os.path.exists(face_loss_path) and \
            face_loss_path.endswith(".npz"):
        path = face_loss_path
    elif name not in ("random",) and "senet" not in name and \
            os.path.exists(DEFAULT_FACELOSS_WEIGHTS):
        path = DEFAULT_FACELOSS_WEIGHTS
    if path:
        from ipercore_tpu.utils.checkpoint import load_params

        params = load_params(path, like=params)
    return net, params, hw


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


class ChannelPReLU(nn.Module):
    """Per-channel PReLU with the torch parameter name ('weight')."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, a * x)


class SphereFaceFeatures(nn.Module):
    """EXACT Sphere20a trunk — `faceloss.py:203-287`: conv{s}_{i} + per-channel
    PReLU (relu{s}_{i}), residual pairs, fc5 on the flattened (512, 7, 6)
    stage-4 map. Layer/parameter names match the torch checkpoint keys so
    `torch_convert.convert_sphereface` drops pretrained weights in.

    Emits the 5 per-stage activations used by the reference's face loss.
    Input: (N, 112, 96, 3).
    """

    @nn.compact
    def __call__(self, x):
        def conv(name, width, stride=1):
            return nn.Conv(width, (3, 3), strides=(stride, stride),
                           padding=PAD3, name=name)

        def prelu(name, width):
            return ChannelPReLU(width, name=name)

        def res_pair(x, s, i, width):
            h = prelu(f"relu{s}_{i}", width)(conv(f"conv{s}_{i}", width)(x))
            h = prelu(f"relu{s}_{i + 1}", width)(conv(f"conv{s}_{i + 1}", width)(h))
            return x + h

        feats = []
        x = prelu("relu1_1", 64)(conv("conv1_1", 64, 2)(x))
        x = res_pair(x, 1, 2, 64)
        feats.append(x)

        x = prelu("relu2_1", 128)(conv("conv2_1", 128, 2)(x))
        x = res_pair(x, 2, 2, 128)
        x = res_pair(x, 2, 4, 128)
        feats.append(x)

        x = prelu("relu3_1", 256)(conv("conv3_1", 256, 2)(x))
        x = res_pair(x, 3, 2, 256)
        x = res_pair(x, 3, 4, 256)
        x = res_pair(x, 3, 6, 256)
        x = res_pair(x, 3, 8, 256)
        feats.append(x)

        x = prelu("relu4_1", 512)(conv("conv4_1", 512, 2)(x))
        x = res_pair(x, 4, 2, 512)
        feats.append(x)

        # torch flattens NCHW (C, H, W): permute before the dense layer so
        # converted fc5 weights are a pure reshape away
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.Dense(512, name="fc5")(x)
        feats.append(x)
        return feats


# per-level weights, `faceloss.py:302` — shared by Sphere20a and SENet-50
FACE_SLICE_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


def face_loss(face_params, apply_fn, pred: jnp.ndarray, target: jnp.ndarray,
              pred_bbox: jnp.ndarray | None = None,
              target_bbox: jnp.ndarray | None = None,
              hw: tuple[int, int] = (112, 96),
              weights: Sequence[float] = FACE_SLICE_WEIGHTS) -> jnp.ndarray:
    """Weighted L1 over face-net feature levels of head crops —
    `FaceLoss.compute_loss` (`faceloss.py:362-378`, weights `faceloss.py:302`).

    Crops are (N, 4) normalized NDC bboxes; when None the full image is
    resized. `hw` is (112, 96) for Sphere20a, (224, 224) for SENet-50
    (`faceloss.py:291-299`).
    """
    from ipercore_tpu.models.networks.discriminators import crop_by_bbox

    def prep(img, bbox):
        if bbox is not None:
            img = crop_by_bbox(img, bbox, hw)
        else:
            img = resize_image(img, hw[0], hw[1])
        return img

    fp = apply_fn(face_params, prep(pred, pred_bbox))
    ft = apply_fn(face_params, prep(jax.lax.stop_gradient(target), target_bbox))
    loss = 0.0
    for w, a, b in zip(weights, fp, ft):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss


# ---------------------------------------------------------------------------
# SENet-50 face identity variant (`faceloss.py:70-206`, VGGFace2 senet50)
# ---------------------------------------------------------------------------


class SEBottleneck(nn.Module):
    """`faceloss.py:70-121` Bottleneck: 1x1(stride)-3x3-1x1 with an SE gate
    (global-avgpool -> conv4 1x1 -> relu -> conv5 1x1 -> sigmoid) multiplied
    onto the residual branch before the skip add."""

    planes: int
    stride: int = 1
    downsample: bool = False
    compress_rate: int = 16

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                      use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=PAD3, use_bias=False,
                      name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)

        gate = jnp.mean(out, axis=(1, 2), keepdims=True)
        gate = nn.Conv(self.planes * 4 // self.compress_rate, (1, 1),
                       name="conv4")(gate)
        gate = nn.relu(gate)
        gate = nn.Conv(self.planes * 4, (1, 1), name="conv5")(gate)
        gate = nn.sigmoid(gate)

        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="downsample_conv")(x)
            x = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(x)
        return nn.relu(gate * out + x)


class SENetFaceFeatures(nn.Module):
    """EXACT SENet-50 trunk — `faceloss.py:125-206` (`senet50`, layers
    [3, 4, 6, 3], include_top=False): 7x7/2 stem + ceil-mode 3x3/2 maxpool,
    then 4 SE-bottleneck stages. Emits the reference's 5 per-stage feature
    maps [x0..x4]. Input: (N, 224, 224, 3)."""

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        # torch MaxPool2d(3, 2, padding=0, ceil_mode=True): pad only the
        # bottom/right edge (flax pads max_pool with -inf).
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        feats = [x]
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers), start=1):
            stride = 1 if li == 1 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or inplanes != planes * 4)
                x = SEBottleneck(planes, stride=s, downsample=down,
                                 name=f"layer{li}_{bi}")(x)
                inplanes = planes * 4
            feats.append(x)
        return feats


def build_face_net(face_loss_path: str = "sphere20a"):
    """Face net by checkpoint path — `FaceLoss.__init__` (`faceloss.py:291-299`)
    selects SENet-50 @224x224 when the path mentions 'senet', else Sphere20a
    @112x96. Returns (module, (height, width))."""
    if "senet" in os.path.basename(face_loss_path).lower():
        return SENetFaceFeatures(), (224, 224)
    return SphereFaceFeatures(), (112, 96)


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
