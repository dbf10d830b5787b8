"""Evaluation: SSIM / PSNR / perceptual (LPIPS-style) / FID-style metrics.

The reference's evaluation script is missing from its repo (`docs/evaluate.md`
references `scripts/evaluate/eval_imitator.py`, absent — SURVEY.md §2.8); this
module builds it from the doc description: frame-level SSIM + LPIPS between
synthesized and ground-truth frames, plus a feature-statistics distance.

LPIPS here is the perceptual distance through our VGG feature pyramid
(`ipercore_tpu.models.networks.criterions.VGGFeatures`) with unit-normalized
features — exactly LPIPS's construction; loading converted LPIPS weights makes
it the published metric, while the random-feature fallback still ranks methods
consistently for relative comparisons.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """PSNR over [-1, 1] images (per item). a, b: (N, H, W, C)."""
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10))


def ssim(a: jnp.ndarray, b: jnp.ndarray, window: int = 7) -> jnp.ndarray:
    """Mean SSIM per item over [-1, 1] NHWC images (uniform window)."""
    C1, C2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2

    def box(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "VALID"
        ) / (window * window)

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a ** 2
    var_b = box(b * b) - mu_b ** 2
    cov = box(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + C1) * (2 * cov + C2)) / (
        (mu_a ** 2 + mu_b ** 2 + C1) * (var_a + var_b + C2))
    return jnp.mean(s, axis=(1, 2, 3))


class PerceptualMetric:
    """LPIPS-style distance through a VGG feature pyramid."""

    def __init__(self, params=None, image_size: int = 256):
        from ipercore_tpu.models.networks.criterions import (
            VGGFeatures, init_vgg_params)

        self.net = VGGFeatures()
        if params is None:
            # trained perceptual weights (scripts/train_vgg.py) when present
            params = init_vgg_params(jax.random.PRNGKey(0), image_size)
        self.params = params

        @jax.jit
        def dist(p, a, b):
            fa = self.net.apply(p, a)
            fb = self.net.apply(p, b)
            total = 0.0
            for x, y in zip(fa, fb):
                xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
                yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
                total = total + jnp.mean((xn - yn) ** 2, axis=(1, 2, 3))
            return total / len(fa)

        self._dist = dist

    def __call__(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.asarray(self._dist(self.params, jnp.asarray(a), jnp.asarray(b)))

    def feature_stats(self, imgs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Mean/cov of pooled deep features (FID-style statistics)."""
        feats = self.net.apply(self.params, jnp.asarray(imgs))[-1]
        pooled = np.asarray(jnp.mean(feats, axis=(1, 2)))
        return pooled.mean(0), np.cov(pooled, rowvar=False)


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """Frechet distance between gaussians (FID formula; trace-sqrt via eigh)."""
    diff = mu1 - mu2
    # sqrt(cov1 @ cov2) via eigen decomposition of the symmetrized product
    prod = cov1 @ cov2
    w, v = np.linalg.eig(prod)
    sqrt_trace = np.sqrt(np.maximum(w.real, 0)).sum()
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * sqrt_trace)


import os

_ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "assets")
INCEPTION_WEIGHTS = os.path.join(_ASSETS, "inception_v3.npz")
LPIPS_WEIGHTS = os.path.join(_ASSETS, "lpips_vgg.npz")


class InceptionFID:
    """FID statistics through the real InceptionV3 pool3 features (the
    published metric, reference protocol `docs/evaluate.md:4-11`). Requires
    converted torchvision weights (`convert_inception` ->
    `assets/inception_v3.npz`); `available()` says whether they exist."""

    def __init__(self, weights_path: str = None):
        from ipercore_tpu.models.networks.inception import InceptionV3Features

        self.net = InceptionV3Features()
        self.path = weights_path or INCEPTION_WEIGHTS
        self.params = None
        if os.path.exists(self.path):
            from ipercore_tpu.utils.checkpoint import load_params

            like = jax.eval_shape(
                lambda r: self.net.init(r, jnp.zeros((1, 299, 299, 3))),
                jax.random.PRNGKey(0))
            like = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), like)
            self.params = load_params(self.path, like=like)
            self._apply = jax.jit(self.net.apply)

    @property
    def available(self) -> bool:
        return self.params is not None

    def feature_stats(self, imgs: np.ndarray, batch: int = 16):
        """imgs (N, H, W, 3) in [-1, 1] -> (mu (2048,), cov (2048, 2048))."""
        x = jax.image.resize(jnp.asarray(imgs),
                             (len(imgs), 299, 299, 3), "bilinear")
        feats = [np.asarray(self._apply(self.params, x[i:i + batch]))
                 for i in range(0, len(imgs), batch)]
        pooled = np.concatenate(feats, 0)
        return pooled.mean(0), np.cov(pooled, rowvar=False)


class LPIPSMetric:
    """True LPIPS(lin) when converted official weights exist
    (`assets/lpips_vgg.npz`); `available()` gates the metric key."""

    def __init__(self, weights_path: str = None):
        from ipercore_tpu.models.networks.criterions import LPIPSLin

        self.net = LPIPSLin()
        self.path = weights_path or LPIPS_WEIGHTS
        self.params = None
        if os.path.exists(self.path):
            from ipercore_tpu.utils.checkpoint import load_params

            like = jax.eval_shape(
                lambda r: self.net.init(r, jnp.zeros((1, 64, 64, 3)),
                                        jnp.zeros((1, 64, 64, 3))),
                jax.random.PRNGKey(0))
            like = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), like)
            self.params = load_params(self.path, like=like)
            self._apply = jax.jit(self.net.apply)

    @property
    def available(self) -> bool:
        return self.params is not None

    def __call__(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.asarray(self._apply(self.params, jnp.asarray(a),
                                      jnp.asarray(b)))


def evaluate_frames(pred: np.ndarray, gt: np.ndarray,
                    metric: Optional[PerceptualMetric] = None,
                    fid_net: Optional[InceptionFID] = None,
                    lpips_net: Optional[LPIPSMetric] = None) -> dict:
    """All metrics over (N, H, W, 3) [-1, 1] frame stacks.

    Metric keys are honest about which feature net ran ("exact when weights
    present, proxy otherwise"): `lpips` / `fid` appear only when the
    converted official LPIPS / InceptionV3 checkpoints exist in `assets/`;
    the repo-trained VGG pyramid otherwise yields `lpips_proxy` /
    `fid_proxy` (see docs/EVALUATION.md).
    """
    a, b = jnp.asarray(pred), jnp.asarray(gt)
    out = {
        "ssim": float(jnp.mean(ssim(a, b))),
        "psnr": float(jnp.mean(psnr(a, b))),
    }
    lpips_net = lpips_net if lpips_net is not None else LPIPSMetric()
    fid_net = fid_net if fid_net is not None else InceptionFID()

    # The proxy VGG pyramid (~36MB checkpoint + a jit) is only needed when an
    # exact net is missing — build it lazily so the exact path stays cheap.
    def get_metric():
        nonlocal metric
        if metric is None:
            metric = PerceptualMetric(image_size=pred.shape[1])
        return metric

    if lpips_net.available:
        out["lpips"] = float(np.mean(lpips_net(pred, gt)))
    else:
        out["lpips_proxy"] = float(np.mean(get_metric()(pred, gt)))
    if fid_net.available:
        mu1, c1 = fid_net.feature_stats(pred)
        mu2, c2 = fid_net.feature_stats(gt)
        out["fid"] = frechet_distance(mu1, c1, mu2, c2)
    else:
        mu1, c1 = get_metric().feature_stats(pred)
        mu2, c2 = get_metric().feature_stats(gt)
        out["fid_proxy"] = frechet_distance(mu1, c1, mu2, c2)
    return out
