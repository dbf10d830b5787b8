"""Silhouette-deformer validation against a rendered-silhouette ground truth
(VERDICT r1, §2.6: the splat soft-silhouette fit existed but was never
validated against what the reference actually optimizes toward — an observed
hard silhouette of a differently-shaped body; ref `sil_deformer.py:55-118`)."""
import numpy as np
import jax
import jax.numpy as jnp

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.ops import rasterizer as rz
from ipercore_tpu.tools.deformers import (
    run_sil2smpl_offsets, soft_silhouette_raster)


class _FakeInfo:
    def __init__(self, arrays):
        self.arrays = dict(arrays)

    def get_array(self, key):
        return self.arrays.get(key)


class _Opt(dict):
    def get(self, k, d=None):
        return dict.get(self, k, d)

    __getattr__ = dict.__getitem__


def _hard_sil(model, theta, offsets, size):
    details = smpl_mod.get_details(model, theta, offsets=offsets)
    _, fim, _ = rz.render_fim_wim(details["verts"], details["cam"],
                                  model.faces, size)
    return (np.asarray(fim) >= 0).astype(np.float32)


def test_offsets_fit_recovers_wider_body():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    size = 64
    theta = np.zeros((2, 85), np.float32)
    theta[:, 0] = 1.2
    theta[:, 4] = [0.0, 0.15]  # slight cam shift on frame 2

    # ground truth: a wider body (radial x/z expansion)
    v = np.asarray(model.v_template)
    gt_off = np.zeros_like(v)
    gt_off[:, 0] = 0.15 * v[:, 0]
    gt_off[:, 2] = 0.15 * v[:, 2]

    sil = _hard_sil(model, jnp.asarray(theta), jnp.asarray(gt_off), size)
    masks = 1.0 - sil[..., None]  # background=1 convention

    info = _FakeInfo({"smpls": theta, "masks": masks})
    opt = _Opt(smoke_model=True)  # resolve to the same synthetic model
    offsets = run_sil2smpl_offsets(opt, info, n_steps=200, lr=2e-3, reg=1.0,
                                   size=size)
    assert offsets.shape == v.shape and np.isfinite(offsets).all()

    # the fit must explain the observed silhouette better than zero offsets
    def soft_err(off):
        details = smpl_mod.get_details(model, jnp.asarray(theta),
                                       offsets=jnp.asarray(off))
        sils = jax.vmap(
            lambda vv, c: soft_silhouette_raster(vv, c, model.faces, size))(
            details["verts"], details["cam"])
        return float(jnp.mean((sils - jnp.asarray(sil)) ** 2))

    err0 = soft_err(np.zeros_like(v))
    err1 = soft_err(offsets)
    assert err1 < err0, (err0, err1)

    # through the REAL renderer: the hard silhouette with fitted offsets must
    # overlap the observed one better than the undeformed body does
    def iou(a, b):
        return (a * b).sum() / np.maximum((a + b - a * b).sum(), 1)

    sil_fit = _hard_sil(model, jnp.asarray(theta), jnp.asarray(offsets), size)
    sil_zero = _hard_sil(model, jnp.asarray(theta), jnp.zeros_like(v), size)
    assert iou(sil_fit, sil) > iou(sil_zero, sil), (
        iou(sil_fit, sil), iou(sil_zero, sil))

    # and move in the true direction: the observed body is WIDER, so the
    # fitted silhouette area must grow toward (not past) the observed area.
    # (A vertex-wise offset comparison is not meaningful: the silhouette
    # only constrains boundary vertices, z is unobservable under weak
    # perspective, and interior vertices are pinned by the L2 reg.)
    a_zero, a_fit, a_obs = sil_zero.sum(), sil_fit.sum(), sil.sum()
    assert a_zero < a_obs  # the setup really is an expansion
    assert a_fit > a_zero, (a_fit, a_zero)
    assert abs(a_fit - a_obs) < abs(a_zero - a_obs), (a_fit, a_zero, a_obs)


def test_sil_fit_grad_memory_bounded():
    """grad(silhouette fit) must not stash per-chunk rasterizer residuals.

    Before the scan body was rematted, grad-of-scan saved every chunk's
    (chunk, P, 3) einsum for the backward pass: at size=128 x 4 frames that
    is ~10 GB logical (58 GB after TPU tile padding) — the deform stage
    OOMed on the real sample media. This compiles the REAL-cardinality
    problem (default synthetic model = SMPL's 13776 faces) and bounds the
    compiled temp allocation."""
    import pytest

    model = smpl_mod.synthetic_model()  # SMPL cardinalities: 13776 faces
    size, n = 128, 4
    theta = jnp.zeros((n, 85), jnp.float32).at[:, 0].set(1.2)
    obs = jnp.zeros((n, size, size), jnp.float32)

    def loss_fn(offsets):
        details = smpl_mod.get_details(model, theta, offsets=offsets)
        sils = jax.vmap(
            lambda vv, c: soft_silhouette_raster(vv, c, model.faces, size))(
            details["verts"], details["cam"])
        return jnp.mean((sils - obs) ** 2) + jnp.mean(offsets ** 2)

    offsets = jnp.zeros((model.v_template.shape[0], 3), jnp.float32)
    compiled = jax.jit(jax.grad(loss_fn)).lower(offsets).compile()
    try:
        ma = compiled.memory_analysis()
        temp = ma.temp_size_in_bytes
    except Exception:
        pytest.skip("backend exposes no memory analysis")
    assert temp < 2 * 1024 ** 3, f"temp allocation {temp / 2**30:.2f} GiB"
