"""Human digitalization deformers: silhouette-fitted vertex offsets + cloth links.

Rebuilds `iPERCore/tools/human_digitalizer/deformers/`:
  * `SilhouetteDeformer` (`sil_deformer.py:55-118`): optimize per-vertex
    offsets (V, 3) so the rendered soft silhouette matches the observed one —
    Adam, 500 steps, MSE + L2 reg. The differentiable silhouette here is a
    splat-based soft coverage (sum of gaussian vertex splats), which gives the
    same gradient signal as NMR's soft silhouette without a soft rasterizer.
  * cloth link discovery (`clothlinks_deformer.py:164` + `link_utils.py`):
    skirt/dress masks link leg vertices to the skirt hem. Geometry-only
    stand-in: vertices inside the cloth mask but below the hem get linked to
    their nearest same-column vertex above the hem.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.ops.rasterizer import project_verts


def soft_silhouette(verts: jnp.ndarray, cam: jnp.ndarray, size: int,
                    sigma: float = 2.0) -> jnp.ndarray:
    """Differentiable vertex-splat silhouette.

    Args:
        verts: (V, 3); cam: (3,).

    Returns:
        (size, size) coverage in [0, 1].
    """
    proj = project_verts(verts[None], cam[None])[0]  # (V, 3)
    px = (proj[:, 0] + 1.0) * (size * 0.5) - 0.5
    py = (proj[:, 1] + 1.0) * (size * 0.5) - 0.5
    xs = jnp.arange(size, dtype=jnp.float32)
    # separable splat: exp(-dx^2) exp(-dy^2) accumulated via matmul
    gx = jnp.exp(-((xs[None, :] - px[:, None]) ** 2) / (2 * sigma ** 2))  # (V, S)
    gy = jnp.exp(-((xs[None, :] - py[:, None]) ** 2) / (2 * sigma ** 2))  # (V, S)
    acc = gy.T @ gx  # (S, S) sum over vertices of splat outer products
    return 1.0 - jnp.exp(-acc)


def run_sil2smpl_offsets(opt, info, n_steps: int = 500, lr: float = 1e-4,
                         reg: float = 1e4, size: int = 128) -> np.ndarray:
    """Fit per-vertex offsets to observed silhouettes — `sil_deformer.py:79-118`.

    Args:
        info: ProcessInfo with `smpls` and `masks` (background=1).

    Returns:
        offsets: (V, 3) float32.
    """
    smpls = info.get_array("smpls")
    masks = info.get_array("masks")
    if getattr(opt, "get", None) and opt.get("smoke_model", False):
        model = smpl_mod.synthetic_model(nu=20, nv=18)
        n_steps = min(n_steps, 10)
    else:
        model = smpl_mod.synthetic_model()
    V = model.v_template.shape[0]
    if smpls is None or masks is None or len(smpls) == 0:
        return np.zeros((V, 3), np.float32)

    n = min(4, len(smpls))  # a few frames suffice (reference uses the sources)
    theta = jnp.asarray(smpls[:n], jnp.float32)
    obs = 1.0 - jnp.asarray(masks[:n], jnp.float32)  # person=1
    obs = jax.image.resize(obs, (n, size, size, 1), "linear")[..., 0]

    def loss_fn(offsets):
        details = smpl_mod.get_details(model, theta, offsets=offsets)
        sils = jax.vmap(lambda v, c: soft_silhouette(v, c, size))(
            details["verts"], details["cam"])
        data = jnp.mean((sils - obs) ** 2)
        return data + reg * jnp.mean(offsets ** 2)

    tx = optax.adam(lr)
    offsets = jnp.zeros((V, 3), jnp.float32)
    state = tx.init(offsets)

    @jax.jit
    def step(offsets, state):
        loss, g = jax.value_and_grad(loss_fn)(offsets)
        upd, state = tx.update(g, state, offsets)
        return optax.apply_updates(offsets, upd), state, loss

    for _ in range(n_steps):
        offsets, state, loss = step(offsets, state)
    return np.asarray(offsets)


def find_cloth_links(verts: np.ndarray, cloth_mask_low_y: float) -> np.ndarray:
    """Link leg vertices below the cloth hem to the hem ring —
    role of `ClothSmplLinkDeformer.find_links` (`clothlinks_deformer.py:176`).

    Args:
        verts: (V, 3) template vertices; cloth_mask_low_y: hem height (world y).

    Returns:
        links_ids: (L, 3) int32 (from_vert, to_vert, flag).
    """
    below = np.nonzero(verts[:, 1] < cloth_mask_low_y)[0]
    ring = np.nonzero(
        (verts[:, 1] >= cloth_mask_low_y) & (verts[:, 1] < cloth_mask_low_y + 0.08)
    )[0]
    if len(ring) == 0 or len(below) == 0:
        return np.zeros((0, 3), np.int32)
    # nearest ring vertex in the xz plane
    d2 = ((verts[below][:, None, [0, 2]] - verts[ring][None, :, [0, 2]]) ** 2).sum(-1)
    nearest = ring[np.argmin(d2, axis=1)]
    flags = np.ones((len(below),), np.int32)
    return np.stack([below.astype(np.int32), nearest.astype(np.int32), flags], axis=1)
