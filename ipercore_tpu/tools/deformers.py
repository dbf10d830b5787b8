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


def soft_silhouette_raster(verts: jnp.ndarray, cam: jnp.ndarray,
                           faces: jnp.ndarray, size: int,
                           sigma: float | None = None, chunk: int = 512) -> jnp.ndarray:
    """SoftRas-style differentiable silhouette through the real triangles.

    Per pixel p and face f: coverage c_f(p) = sigmoid(min_bary(p, f) / sigma)
    (min barycentric coordinate > 0 iff p is inside f), aggregated as
    1 - prod_f (1 - c_f) in log space via a face-chunked scan. This is the
    same occupancy construction as NMR's soft rasterizer (the reference's
    `SilhouetteDeformer` gradient source, `sil_deformer.py:55-118`) without
    the z channel, which silhouette fitting does not need.

    Args:
        verts: (V, 3); cam: (3,); faces: (F, 3) int.

    Returns:
        (size, size) coverage in [0, 1], differentiable wrt verts.
    """
    from ipercore_tpu.ops.rasterizer import (
        _face_bary_matrices, _pixel_centers, verts_to_faces)

    if sigma is None:
        # soften over roughly a pixel: min_bary changes by ~px_size/edge_ndc
        # per pixel; body-mesh edges are a few pixels, so ~1/size transitions
        # over ~a pixel without washing the shape out
        sigma = 1.0 / size
    proj = project_verts(verts[None], cam[None])[0]  # (V, 3)
    fv = verts_to_faces(proj[None], faces)[0]  # (F, 3, 3)
    M, valid = _face_bary_matrices(fv)  # (F, 3, 3), (F,)
    pix = _pixel_centers(size, fv.dtype)  # (P, 3)

    F = M.shape[0]
    pad = (-F) % chunk
    Mp = jnp.pad(M, ((0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(valid, (0, pad))
    Mc = Mp.reshape(-1, chunk, 3, 3)
    vc = vp.reshape(-1, chunk)

    def body(carry, mv):
        Mf, vf = mv
        w = jnp.einsum("fab,pb->fpa", Mf, pix)  # (chunk, P, 3)
        minw = jnp.min(w, axis=-1)  # (chunk, P)
        c = jax.nn.sigmoid(minw / sigma) * vf[:, None]
        carry = carry + jnp.sum(jnp.log1p(-jnp.clip(c, 0.0, 1.0 - 1e-6)), axis=0)
        return carry, None

    # remat the chunk body: without it, grad-of-scan stashes every chunk's
    # (chunk, P, 3) einsum for the backward pass — 27 chunks x 4 frames at
    # size=128 is ~10 GB logical and worse after TPU (8,128) tile padding
    # (observed: a 58 GB allocation OOMing the deform stage on real media).
    # Recomputing the einsum in the backward pass keeps residuals at O(P).
    body = jax.checkpoint(body, prevent_cse=False)
    log_miss, _ = jax.lax.scan(body, jnp.zeros((pix.shape[0],)), (Mc, vc))
    return (1.0 - jnp.exp(log_miss)).reshape(size, size)


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
    model = smpl_mod.resolve_body_model(opt)
    if getattr(opt, "get", None) and opt.get("smoke_model", False):
        n_steps = min(n_steps, 10)
    V = model.v_template.shape[0]
    if smpls is None or masks is None or len(smpls) == 0:
        return np.zeros((V, 3), np.float32)

    n = min(4, len(smpls))  # a few frames suffice (reference uses the sources)
    theta = jnp.asarray(smpls[:n], jnp.float32)
    obs = 1.0 - jnp.asarray(masks[:n], jnp.float32)  # person=1
    obs = jax.image.resize(obs, (n, size, size, 1), "linear")[..., 0]

    def loss_fn(offsets):
        details = smpl_mod.get_details(model, theta, offsets=offsets)
        sils = jax.vmap(
            lambda v, c: soft_silhouette_raster(v, c, model.faces, size))(
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


# Mean body shape used by the reference linker (`link_utils.py:66-68`) —
# a 10-dim constant, reused verbatim (data, not code).
LINKER_MEAN_SHAPE = np.array(
    [-0.00124704, 0.00200815, 0.01044902, 0.01385473, 0.01137672,
     -0.01685408, 0.0201432, -0.00677187, 0.0050879, -0.0051118], np.float32)


def load_leg_vertex_ids() -> Optional[tuple[np.ndarray, np.ndarray]]:
    """(left_leg_ids, right_leg_ids) from `smpl_part_info.json`
    (`link_utils.py:78-79`), or None when the asset is absent."""
    import json

    from ipercore_tpu.models.mesh import find_asset

    path = find_asset("smpl_part_info.json")
    if path is None:
        return None
    with open(path) as f:
        info = json.load(f)
    try:
        left = np.asarray(info["02_left_leg"]["vertex"], np.int64)
        right = np.asarray(info["03_right_leg"]["vertex"], np.int64)
    except KeyError:
        return None
    return left, right


def _inner_leg_ids(model, leg_ids: np.ndarray, rate: float = 0.3,
                   right: bool = True) -> np.ndarray:
    """Inner-facing leg vertices: sort by T-pose x — `link_utils.py:86-117`."""
    theta = np.zeros((1, 3 + model.pose_dim + 10), np.float32)
    theta[0, 0] = 1.0
    theta[0, -10:] = LINKER_MEAN_SHAPE
    verts = np.asarray(smpl_mod.get_details(model, jnp.asarray(theta))["verts"][0])
    leg_ids = leg_ids[(leg_ids >= 0) & (leg_ids < len(verts))]
    x = verts[leg_ids, 0]
    n = int(len(leg_ids) * rate)
    order = np.argsort(x)
    return leg_ids[order[:n]] if right else leg_ids[order[::-1][:n]]


def smpl_link(model, theta: np.ndarray, skirt_y: float,
              leg_ids: Optional[tuple[np.ndarray, np.ndarray]] = None) -> np.ndarray:
    """Link inner leg vertices below the skirt hem to the opposite leg —
    `SmplLinker.link` (`link_utils.py:144-197`).

    Each inner-leg vertex whose projected y lies below the hem
    (`(y + cam_ty) * cam_s <= skirt_y`) links to the opposite leg's nearest
    vertex by y distance, so skinning moves both legs together under the
    skirt (consumed by `lbs(links_ids=...)`, `models/smpl.py:440`).

    Args:
        theta: (85,) or (1, 85) cam+pose+shape; skirt_y: hem in NDC y.

    Returns:
        links_ids: (L, 3) int32 (from_vert, to_vert, flag=1).
    """
    if leg_ids is None:
        leg_ids = load_leg_vertex_ids()
    if leg_ids is None:
        return np.zeros((0, 3), np.int32)
    left_ids, right_ids = leg_ids
    theta = np.asarray(theta, np.float32).reshape(1, -1)
    details = smpl_mod.get_details(model, jnp.asarray(theta))
    verts = np.asarray(details["verts"][0])
    cam = np.asarray(details["cam"][0])
    V = len(verts)
    left_ids = left_ids[(left_ids >= 0) & (left_ids < V)]
    right_ids = right_ids[(right_ids >= 0) & (right_ids < V)]
    if len(left_ids) == 0 or len(right_ids) == 0:
        return np.zeros((0, 3), np.int32)

    inner_r = _inner_leg_ids(model, right_ids, right=True)
    inner_l = _inner_leg_ids(model, left_ids, right=False)

    def _links(inner, opposite):
        # nearest opposite-leg vertex by y only (`link_utils.py:120-145`)
        dy = (verts[inner, 1][:, None] - verts[opposite, 1][None, :]) ** 2
        nearest = opposite[np.argmin(dy, axis=1)]
        proj_y = (verts[inner, 1] + cam[2]) * cam[0]
        keep = proj_y <= skirt_y
        return inner[keep], nearest[keep]

    fr_r, to_r = _links(inner_r, left_ids)
    fr_l, to_l = _links(inner_l, right_ids)
    fr = np.concatenate([fr_r, fr_l])
    to = np.concatenate([to_r, to_l])
    flags = np.ones_like(fr)
    return np.stack([fr, to, flags], axis=1).astype(np.int32)


def find_cloth_links_schp(parser, image: np.ndarray, theta: np.ndarray,
                          model) -> tuple[bool, np.ndarray]:
    """Skirt/dress-aware cloth links — `ClothSmplLinkDeformer.find_links`
    (`clothlinks_deformer.py:24-65`): SCHP skirt+dress mask -> lowest hem row
    -> NDC y -> `smpl_link`.

    Args:
        parser: `tools.parsers.SchpParser` (trained); image: (H, W, 3) [-1, 1].

    Returns:
        (found, links_ids (L, 3) int32).
    """
    found, masks = parser.run(image[None], target="skirt+dress")
    if not found or not len(masks) or masks[0].sum() == 0:
        return False, np.zeros((0, 3), np.int32)
    mask = masks[0]
    rows = np.nonzero(mask.any(axis=1))[0]
    skirt_y = rows[-1] / mask.shape[0] * 2.0 - 1.0
    links = smpl_link(model, theta, skirt_y)
    return len(links) > 0, links


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
