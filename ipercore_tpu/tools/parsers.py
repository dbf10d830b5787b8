"""SCHP (Self-Correction Human Parsing) — LIP 20-class human/cloth parser.

Rebuilds `iPERCore/tools/human_mattors/schp_parser.py` (719 LoC) TPU-native:
the exact SCHP architecture (`schp_parser.py:232-456`: ResNet-101 trunk with a
3-conv stem, PSP context encoding, edge branch, parsing decoder, fusion head)
in Flax with inference-mode (frozen) BatchNorm so the published
`exp-schp-lip.pth` checkpoint converts layer-for-layer
(`utils/torch_convert.convert_schp`).

TPU-first choices vs the torch original:
  * adaptive average pooling (`PSPModule`, `schp_parser.py:290-294`) is an
    exact matmul against precomputed static pooling matrices — two small
    matmuls on the MXU instead of a dynamic pooling op;
  * `align_corners=True` bilinear resizes (`:296-301,374-380`) are separable
    interpolation matmuls (static shapes, fused by XLA);
  * frames are batched through one jitted forward instead of the reference's
    per-image python loop (`:656-700`).

Post-processing (`find_largest_connected_mask:138`, whole-image affine =
pure resize for the square crops our preprocessor emits) runs host-side on
numpy/scipy.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ipercore_tpu.models.networks.blocks import PAD3, FrozenBatchNorm as FrozenBN

import os as _os

# Trained-on-device weights (scripts/train_schp.py) — auto-loaded by
# `build_parser` when present; converted `exp-schp-lip.pth` weights
# (`utils.torch_convert.convert_schp`) use the same layout.
SCHP_DEFAULT_WEIGHTS = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "assets", "schp.npz")

# LIP label semantics — `schp_parser.py:49-58` DATASET_SETTINGS["lip"].
LIP_INPUT_SIZE = 473
LIP_NUM_CLASSES = 20
LIP_LABELS = [
    "Background", "Hat", "Hair", "Glove", "Sunglasses", "Upper-clothes",
    "Dress", "Coat", "Socks", "Pants", "Jumpsuits", "Scarf", "Skirt", "Face",
    "Left-arm", "Right-arm", "Left-leg", "Right-leg", "Left-shoe", "Right-shoe",
]
# Note: the reference's LIP "body" set omits class 5 (Upper-clothes) —
# `schp_parser.py:56` — kept verbatim for parity.
LIP_TARGETS = {
    "body": (1, 2, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19),
    "skirt+dress": (6, 12),
    "background": (0,),
}


class ABN(nn.Module):
    """BatchNorm + LeakyReLU(0.01) — `InPlaceABNSync` (`schp_parser.py:215-229`)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(FrozenBN(self.features, name="bn")(x), 0.01)


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation weights."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    t = (src - lo).astype(np.float32)
    w[np.arange(n_out), lo] += 1.0 - t
    w[np.arange(n_out), hi] += t
    return w


def resize_bilinear_ac(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize of (N, H, W, C) via two matmuls."""
    H, W = x.shape[1], x.shape[2]
    if (H, W) == (h, w):
        return x
    wy = jnp.asarray(_interp_matrix(H, h))  # (h, H)
    wx = jnp.asarray(_interp_matrix(W, w))  # (w, W)
    x = jnp.einsum("yH,nHWc->nyWc", wy, x)
    return jnp.einsum("xW,nyWc->nyxc", wx, x)


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix of torch AdaptiveAvgPool regions."""
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        a = (i * n_in) // n_out
        b = -((-(i + 1) * n_in) // n_out)  # ceil
        w[i, a:b] = 1.0 / (b - a)
    return w


def adaptive_avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact AdaptiveAvgPool2d((k, k)) on (N, H, W, C) as two matmuls."""
    py = jnp.asarray(_adaptive_pool_matrix(x.shape[1], k))
    px = jnp.asarray(_adaptive_pool_matrix(x.shape[2], k))
    x = jnp.einsum("yH,nHWc->nyWc", py, x)
    return jnp.einsum("xW,nyWc->nyxc", px, x)


class SchpBottleneck(nn.Module):
    """ResNet bottleneck with dilation — `schp_parser.py:232-270`."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBN(self.features, name="bn1")(y))
        d = self.dilation
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((d, d), (d, d)), kernel_dilation=(d, d),
                    use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenBN(self.features, name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBN(self.features * 4, name="bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv")(x)
            residual = FrozenBN(self.features * 4, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class PSPModule(nn.Module):
    """Pyramid scene parsing context head — `schp_parser.py:273-301`."""

    out_features: int = 512
    sizes: tuple = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool(x, size)
            p = nn.Conv(self.out_features, (1, 1), use_bias=False,
                        name=f"stage{i}_conv")(p)
            p = ABN(self.out_features, name=f"stage{i}_abn")(p)
            priors.append(resize_bilinear_ac(p, h, w))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (3, 3), padding=PAD3, use_bias=False,
                    name="bottleneck_conv")(y)
        return ABN(self.out_features, name="bottleneck_abn")(y)


class EdgeModule(nn.Module):
    """Edge branch over (x2, x3, x4) — `schp_parser.py:304-346`."""

    mid_fea: int = 256
    out_fea: int = 2

    @nn.compact
    def __call__(self, x1, x2, x3):
        h, w = x1.shape[1], x1.shape[2]
        conv4 = nn.Conv(self.out_fea, (3, 3), padding=PAD3, name="conv4")

        def branch(x, i):
            fea = nn.Conv(self.mid_fea, (1, 1), use_bias=False,
                          name=f"conv{i}_conv")(x)
            fea = ABN(self.mid_fea, name=f"conv{i}_abn")(fea)
            return fea, conv4(fea)

        fea1, edge1 = branch(x1, 1)
        fea2, edge2 = branch(x2, 2)
        fea3, edge3 = branch(x3, 3)
        fea2 = resize_bilinear_ac(fea2, h, w)
        fea3 = resize_bilinear_ac(fea3, h, w)
        edge2 = resize_bilinear_ac(edge2, h, w)
        edge3 = resize_bilinear_ac(edge3, h, w)
        edge = nn.Conv(self.out_fea, (1, 1), name="conv5")(
            jnp.concatenate([edge1, edge2, edge3], axis=-1))
        edge_fea = jnp.concatenate([fea1, fea2, fea3], axis=-1)
        return edge, edge_fea


class DecoderModule(nn.Module):
    """Parsing decoder (PSP feature + low-level x2) — `schp_parser.py:349-382`."""

    num_classes: int

    @nn.compact
    def __call__(self, xt, xl):
        h, w = xl.shape[1], xl.shape[2]
        xt = nn.Conv(256, (1, 1), use_bias=False, name="conv1_conv")(xt)
        xt = ABN(256, name="conv1_abn")(xt)
        xt = resize_bilinear_ac(xt, h, w)
        xl = nn.Conv(48, (1, 1), use_bias=False, name="conv2_conv")(xl)
        xl = ABN(48, name="conv2_abn")(xl)
        x = jnp.concatenate([xt, xl], axis=-1)
        x = nn.Conv(256, (1, 1), use_bias=False, name="conv3a_conv")(x)
        x = ABN(256, name="conv3a_abn")(x)
        x = nn.Conv(256, (1, 1), use_bias=False, name="conv3b_conv")(x)
        x = ABN(256, name="conv3b_abn")(x)
        seg = nn.Conv(self.num_classes, (1, 1), name="conv4")(x)
        return seg, x


class SchpNet(nn.Module):
    """Full SCHP graph — `schp_parser.py:384-455` (ResNet-101, layers 3/4/23/3).

    Input (N, H, W, 3) normalized; output (N, H/4, W/4, num_classes) fusion
    logits (the reference upsamples to the frame size outside the net).
    """

    num_classes: int = LIP_NUM_CLASSES
    layers: tuple = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x):
        for i, width in ((1, 64), (2, 64), (3, 128)):
            x = nn.Conv(width, (3, 3), strides=(2, 2) if i == 1 else (1, 1),
                        padding=PAD3, use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(FrozenBN(width, name=f"bn{i}")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x1 = nn.max_pool(x, (3, 3), strides=(2, 2))
        feats = [x1]
        for li, (blocks, width) in enumerate(zip(self.layers, (64, 128, 256, 512)), 1):
            h = feats[-1]
            for b in range(blocks):
                stride = 2 if (b == 0 and li in (2, 3)) else 1
                dilation = 2 if li == 4 else 1
                h = SchpBottleneck(width, stride, dilation,
                                   name=f"layer{li}_{b}")(h)
            feats.append(h)
        _, x2, x3, x4, x5 = feats
        ctx = PSPModule(name="context_encoding")(x5)
        parsing_result, parsing_fea = DecoderModule(
            self.num_classes, name="decoder")(ctx, x2)
        edge_result, edge_fea = EdgeModule(name="edge")(x2, x3, x4)
        fused = jnp.concatenate([parsing_fea, edge_fea], axis=-1)
        fused = nn.Conv(256, (1, 1), use_bias=False, name="fushion_conv")(fused)
        fused = ABN(256, name="fushion_abn")(fused)
        # Dropout2d(0.1) is identity at inference (`schp_parser.py:413`).
        return nn.Conv(self.num_classes, (1, 1), name="fushion_head")(fused)


# --- host-side post-processing ----------------------------------------------

def find_largest_connected_mask(mask: np.ndarray) -> np.ndarray:
    """Keep the largest connected component + morphological close —
    `schp_parser.py:138-167` (cv2 contours replaced by scipy labeling)."""
    mask = (mask > 0).astype(np.uint8)
    if mask.sum() == 0:
        return mask
    try:
        from scipy import ndimage
    except Exception:
        return mask
    labels, n = ndimage.label(mask)
    if n > 1:
        sizes = ndimage.sum(mask, labels, index=np.arange(1, n + 1))
        mask = (labels == (1 + int(np.argmax(sizes)))).astype(np.uint8)
    structure = np.ones((5, 5), bool)
    return ndimage.binary_closing(mask.astype(bool), structure).astype(np.uint8)


class SchpParser:
    """Runner — role of `SchpMattor` (`schp_parser.py:599-700`).

    Frames come in as (N, H, W, 3) RGB in [-1, 1] (the repo's image
    convention); SCHP normalization (`:502-508`: BGR, mean/std in [0,1]
    units) is applied inside. `trained=False` (random filters) callers should
    treat results as unavailable — `build_parser` returns None then.
    """

    # BGR mean/std from `schp_parser.py:505-507`, flipped to RGB order.
    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, params=None, input_size: int = LIP_INPUT_SIZE,
                 num_classes: int = LIP_NUM_CLASSES):
        self.net = SchpNet(num_classes=num_classes)
        self.input_size = input_size
        self.trained = params is not None
        if params is None:
            params = jax.jit(self.net.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)))
        self.params = params

        def _forward(params, images_m11):
            # [-1,1] RGB -> [0,1] BGR-normalized (channel flip == reindex).
            x = (images_m11 + 1.0) * 0.5
            x = (x - self.MEAN) / self.STD
            x = resize_bilinear_ac(x, self.input_size, self.input_size)
            logits = self.net.apply(params, x)
            return resize_bilinear_ac(
                logits, images_m11.shape[1], images_m11.shape[2])

        self._forward = jax.jit(_forward)

    def parse(self, images: np.ndarray, batch_size: int = 8) -> np.ndarray:
        """(N, H, W, 3) [-1, 1] -> (N, H, W) int label maps."""
        outs = []
        for i in range(0, len(images), batch_size):
            logits = self._forward(self.params, jnp.asarray(images[i:i + batch_size]))
            outs.append(np.argmax(np.asarray(logits), axis=-1))
        return np.concatenate(outs, axis=0)

    def run(self, images: np.ndarray, target: str = "body",
            min_pixels: int = 100) -> tuple[bool, list[np.ndarray]]:
        """Label + select `target` classes + largest-component cleanup —
        `SchpMattor.run` (`schp_parser.py:624-700`).

        Returns (found, per-frame binary masks). For "skirt+dress" the
        reference bails out when any frame has < 100 target pixels.
        """
        parse = self.parse(images)
        valid = np.zeros((self.net.num_classes,), np.uint8)
        valid[list(LIP_TARGETS[target])] = 1
        masks = []
        for p in parse:
            m = valid[p]
            if target == "skirt+dress" and m.sum() < min_pixels:
                return False, masks
            masks.append(find_largest_connected_mask(m))
        return True, masks


def build_parser(weights_path: Optional[str] = None) -> Optional[SchpParser]:
    """Load SCHP weights (npz of the flax tree — converted torch or
    on-device-trained `assets/schp.npz`) if present; None otherwise —
    downstream stages then keep their geometry fallbacks."""
    import os

    if weights_path is None:
        weights_path = SCHP_DEFAULT_WEIGHTS
    if not os.path.exists(weights_path):
        return None
    from ipercore_tpu.utils.checkpoint import load_params

    params = load_params(weights_path)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), params)
    return SchpParser(params=params)
