"""SMPL mesh rasterization: face-index maps, barycentric-weight maps, dense flows.

TPU-native replacement for the reference's CUDA neural_renderer wrapper
(`iPERCore/tools/human_digitalizer/renders/nmr.py`): `render_fim_wim:319`,
`render_uv_fim_wim:344`, `cal_bc_transform:713`, `get_vis_f2pts:639`,
`encode_fim:390`. One self-consistent coordinate convention replaces NMR's
y-flip dance:

  * Projected vertices live in grid-sample NDC: x in [-1, 1] left -> right,
    y in [-1, 1] top -> bottom. Pixel (row r, col c) center maps to
    x = (2c + 1 - S) / S, y = (2r + 1 - S) / S.
  * `project_verts` applies the weak-perspective camera (HMR convention,
    `nmr.py:34-52`: xy' = s * (xy + t), z preserved), flips y into image
    orientation (`nmr.py:283`), and offsets z by the fixed eye distance
    1/tan(viewing_angle) + 1 (`nmr.py:225` + identity look_at) so depth is
    positive with *smaller = closer*.
  * `f2pts` returned here are directly usable as grid-sample coordinates —
    no second flip is needed (the reference flips twice, `nmr.py:339-341`).

The rasterizer itself is a z-buffered scan over face chunks, formulated so the
barycentric solve is a matmul (MXU) and the depth test a masked min (VPU). All
shapes static; frames/batches vmap over it. A Pallas fast path lives in
`ipercore_tpu/ops/rasterizer_pallas.py` and is validated against this one.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Fixed camera constants, matching the reference renderer defaults
# (`nmr.py:127-225`: viewing_angle=30, near=0.1, far=25).
VIEWING_ANGLE = 30.0
EYE_DISTANCE = 1.0 / math.tan(math.radians(VIEWING_ANGLE)) + 1.0
NEAR = 0.1
FAR = 25.0
# Flow sentinel for "no source here" (reference uses -2 everywhere,
# e.g. `nmr.py:621,658,696,723`): grid_sample of -2 lands outside and yields 0.
FLOW_SENTINEL = -2.0


class RasterOutput(NamedTuple):
    """Rasterization products for one image.

    fim: (S, S) int32 face-index map; -1 = background.
    wim: (S, S, 3) f32 barycentric weights of each pixel in its face.
    """

    fim: jnp.ndarray
    wim: jnp.ndarray


def project_verts(verts: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective project vertices into screen NDC with depth.

    Args:
        verts: (..., V, 3) SMPL vertices.
        cam: (..., 3) camera (scale, tx, ty) — HMR convention.

    Returns:
        (..., V, 3): (x, y) in grid-sample NDC (y down), z = depth + EYE_DISTANCE.
    """
    s = cam[..., None, 0:1]
    t = cam[..., None, 1:3]
    xy = s * (verts[..., 0:2] + t)
    x = xy[..., 0:1]
    y = -xy[..., 1:2]  # flip into image orientation (row grows downward)
    z = verts[..., 2:3] + EYE_DISTANCE
    return jnp.concatenate([x, y, z], axis=-1)


def verts_to_faces(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex attributes.

    Args:
        verts: (..., V, D)
        faces: (F, 3) int vertex indices.

    Returns:
        (..., F, 3, D)
    """
    return jnp.take(verts, faces, axis=-2)


def _pixel_centers(size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(S*S, 3) homogeneous pixel-center coordinates in NDC (x, y, 1)."""
    coords = (2.0 * jnp.arange(size, dtype=dtype) + 1.0 - size) / size
    ys, xs = jnp.meshgrid(coords, coords, indexing="ij")
    ones = jnp.ones_like(xs)
    return jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()], axis=-1)


def _face_bary_matrices(face_verts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-face matrices mapping homogeneous pixel coords to barycentrics.

    For face with screen-space vertices v0, v1, v2 (2D), barycentrics satisfy
    [x, y, 1]^T = V @ w with V = [[x0,x1,x2],[y0,y1,y2],[1,1,1]], so w = V^-1 p.

    Args:
        face_verts: (F, 3, 3) projected (x, y, z) per face vertex.

    Returns:
        M: (F, 3, 3) with w = M @ (x, y, 1); rows of M are barycentric coeffs.
        valid: (F,) mask of non-degenerate, in-depth-range faces.
    """
    x = face_verts[..., 0]  # (F, 3)
    y = face_verts[..., 1]
    z = face_verts[..., 2]
    # V = [[x0,x1,x2],[y0,y1,y2],[1,1,1]]; invert analytically via adjugate.
    det = (
        x[..., 0] * (y[..., 1] - y[..., 2])
        - x[..., 1] * (y[..., 0] - y[..., 2])
        + x[..., 2] * (y[..., 0] - y[..., 1])
    )  # signed 2x area
    degenerate = jnp.abs(det) < 1e-12
    inv_det = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, det))

    def row(i, j):
        # adjugate rows for the 3x3 with unit last row
        return jnp.stack(
            [
                y[..., i] - y[..., j],
                x[..., j] - x[..., i],
                x[..., i] * y[..., j] - x[..., j] * y[..., i],
            ],
            axis=-1,
        )

    M = jnp.stack([row(1, 2), row(2, 0), row(0, 1)], axis=-2) * inv_det[..., None, None]
    # Depth-range validity: any vertex inside (near, far) keeps the face.
    z_ok = (jnp.min(z, axis=-1) < FAR) & (jnp.max(z, axis=-1) > NEAR)
    # Off-screen cull: all three verts share a side outside [-1-eps, 1+eps].
    m = 1.0 + 2.0 / 1.0  # generous margin; sentinel faces sit at -2
    on_screen = ~(
        (jnp.max(x, axis=-1) < -1.5) | (jnp.min(x, axis=-1) > 1.5)
        | (jnp.max(y, axis=-1) < -1.5) | (jnp.min(y, axis=-1) > 1.5)
    )
    del m
    valid = (~degenerate) & z_ok & on_screen
    return M, valid


def _auto_chunk(size: int) -> int:
    """Face-chunk size bounding the (chunk*3, S*S) barycentric intermediate to
    ~128 MB f32 per frame (the z-buffer scan's live working set)."""
    P = size * size
    budget_elems = 32_000_000  # ~128 MB f32 for the (chunk*3, P) matmul output
    c = max(64, budget_elems // (3 * P))
    return min(4096, (c // 64) * 64 or 64)


@functools.partial(jax.jit, static_argnames=("size", "chunk"))
def rasterize(face_verts: jnp.ndarray, size: int, chunk: int | None = None) -> RasterOutput:
    """Z-buffer rasterize triangles to a face-index map + barycentric-weight map.

    XLA reference implementation (correctness path). The barycentric solve for a
    chunk of faces against all pixels is one (3F x 3) @ (3 x P) matmul; the
    depth test is a masked min-reduction carried through a lax.scan over chunks.

    Args:
        face_verts: (F, 3, 3) projected per-face vertices (x, y in NDC, z depth).
            Faces whose vertices are all at the sentinel (-2) are never hit.
        size: output image size S.
        chunk: number of faces processed per scan step.

    Returns:
        RasterOutput(fim (S, S) int32, wim (S, S, 3) f32).
    """
    if chunk is None:
        chunk = _auto_chunk(size)
    F = face_verts.shape[0]
    P = size * size
    pixels = _pixel_centers(size, face_verts.dtype)  # (P, 3)
    pixels_T = pixels.T  # (3, P)

    n_chunks = (F + chunk - 1) // chunk
    pad = n_chunks * chunk - F
    fv = jnp.pad(face_verts, ((0, pad), (0, 0), (0, 0)), constant_values=FLOW_SENTINEL)
    fv = fv.reshape(n_chunks, chunk, 3, 3)
    base_ids = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(n_chunks, chunk)

    init = (
        jnp.full((P,), jnp.inf, dtype=face_verts.dtype),  # best depth
        jnp.full((P,), -1, dtype=jnp.int32),  # best face id
        jnp.zeros((P, 3), dtype=face_verts.dtype),  # best barycentrics
    )

    eps_px = 2.0 / size  # one-pixel slack in NDC

    def step(carry, inp):
        best_z, best_id, best_w = carry
        fvc, ids = inp  # (chunk, 3, 3), (chunk,)
        M, valid = _face_bary_matrices(fvc)  # (chunk, 3, 3), (chunk,)
        # Barycentrics for every (face, pixel): one MXU matmul. HIGHEST
        # precision is load-bearing: sliver faces have huge, canceling M
        # coefficients, and the TPU's default bf16 matmul passes corrupt W.
        W = jax.lax.dot_general(
            M.reshape(chunk * 3, 3), pixels_T,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).reshape(chunk, 3, P)
        inside = jnp.all(W >= -1e-6, axis=1)  # (chunk, P)
        # bbox guard: near-degenerate slivers produce unstable barycentrics
        # that can claim pixels far from the face — restrict coverage to the
        # face's bounding box (+1 px), as a hardware rasterizer would.
        fx, fy = fvc[..., 0], fvc[..., 1]  # (chunk, 3)
        in_bbox = (
            (pixels_T[0][None] >= jnp.min(fx, -1)[:, None] - eps_px)
            & (pixels_T[0][None] <= jnp.max(fx, -1)[:, None] + eps_px)
            & (pixels_T[1][None] >= jnp.min(fy, -1)[:, None] - eps_px)
            & (pixels_T[1][None] <= jnp.max(fy, -1)[:, None] + eps_px)
        )
        inside = inside & in_bbox
        z_face = fvc[..., 2]  # (chunk, 3)
        depth = jnp.einsum("ckp,ck->cp", W, z_face,
                           precision=jax.lax.Precision.HIGHEST)  # (chunk, P)
        ok = inside & valid[:, None] & (depth > NEAR) & (depth < FAR)
        depth = jnp.where(ok, depth, jnp.inf)
        # Per-chunk winner per pixel.
        arg = jnp.argmin(depth, axis=0)  # (P,)
        pix = jnp.arange(P)
        cand_z = depth[arg, pix]
        cand_id = ids[arg]
        cand_w = W[arg, :, pix]  # (P, 3)
        take = cand_z < best_z
        best_z = jnp.where(take, cand_z, best_z)
        best_id = jnp.where(take, cand_id, best_id)
        best_w = jnp.where(take[:, None], cand_w, best_w)
        return (best_z, best_id, best_w), None

    (best_z, best_id, best_w), _ = jax.lax.scan(step, init, (fv, base_ids))
    fim = best_id.reshape(size, size)
    wim = best_w.reshape(size, size, 3)
    return RasterOutput(fim=fim, wim=wim)


def _use_pallas(size: int) -> bool:
    """Dispatch to the Pallas kernel on TPU when the image size fits its tile
    constraints (multiples of 128); the XLA scan covers everything else."""
    return jax.default_backend() == "tpu" and size % 128 == 0


def rasterize_batch(face_verts: jnp.ndarray, size: int, chunk: int | None = None) -> RasterOutput:
    """vmap of `rasterize` over a leading batch axis. face_verts: (N, F, 3, 3).

    Automatically uses the Pallas TPU kernel (~90x faster at 512^2) when
    running on TPU; the XLA scan otherwise.
    """
    if _use_pallas(size):
        from ipercore_tpu.ops.rasterizer_pallas import rasterize_pallas_batch

        return rasterize_pallas_batch(face_verts, size)
    return jax.vmap(lambda fv: rasterize(fv, size, chunk))(face_verts)


def render_fim_wim(
    verts: jnp.ndarray, cam: jnp.ndarray, faces: jnp.ndarray, size: int, chunk: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project + rasterize a batch. Reference parity: `nmr.py:319-342`.

    Args:
        verts: (N, V, 3); cam: (N, 3); faces: (F, 3).

    Returns:
        f2pts: (N, F, 3, 2) screen-space face vertices (grid-sample ready).
        fim: (N, S, S) int32; wim: (N, S, S, 3).
    """
    proj = project_verts(verts, cam)  # (N, V, 3)
    face_verts = verts_to_faces(proj, faces)  # (N, F, 3, 3)
    out = rasterize_batch(face_verts, size, chunk)
    return face_verts[..., 0:2], out.fim, out.wim


def rasterize_uv_template(f2uvs: jnp.ndarray, size: int, chunk: int | None = None) -> RasterOutput:
    """Rasterize the (static) UV-unwrap template once. `nmr.py:344-358`.

    Args:
        f2uvs: (F, 3, 2) per-face UV coordinates in grid-sample NDC.

    Returns:
        RasterOutput for a single (S, S) UV-space image.
    """
    z = jnp.ones(f2uvs.shape[:-1] + (1,), f2uvs.dtype)
    fv = jnp.concatenate([f2uvs, z], axis=-1)
    if _use_pallas(size):
        from ipercore_tpu.ops.rasterizer_pallas import rasterize_pallas

        return rasterize_pallas(fv, size)
    return rasterize(fv, size, chunk)


def cal_bc_transform(
    src_f2pts: jnp.ndarray, dst_fim: jnp.ndarray, dst_wim: jnp.ndarray
) -> jnp.ndarray:
    """Dense backward appearance flow from a destination raster to source coords.

    For each destination pixel covered by face f (dst_fim) with barycentrics w
    (dst_wim), the flow is the w-blend of that face's *source* screen positions.
    Vectorized gather replacing the reference's per-batch python loop
    (`nmr.py:713-757`).

    Args:
        src_f2pts: (N, F, 3, 2) source screen coords per face vertex.
        dst_fim: (N, S, S) int32 destination face-index map.
        dst_wim: (N, S, S, 3) destination barycentric weights.

    Returns:
        (N, S, S, 2) flow grid for grid_sample; background = FLOW_SENTINEL.
    """
    def one(f2pts, fim, wim):
        safe_fid = jnp.maximum(fim, 0)
        src_tri = jnp.take(f2pts, safe_fid.ravel(), axis=0).reshape(fim.shape + (3, 2))
        flow = jnp.sum(src_tri * wim[..., None], axis=-2)  # (S, S, 2)
        return jnp.where((fim >= 0)[..., None], flow, FLOW_SENTINEL)

    return jax.vmap(one)(src_f2pts, dst_fim, dst_wim)


def visible_face_mask(fim: jnp.ndarray, n_faces: int) -> jnp.ndarray:
    """Boolean (N, F) mask of faces visible in each face-index map.

    Static-shape replacement for the reference's `fim.unique()` python-set logic
    (`nmr.py:649-666`): a scatter of ones at visible face ids.
    """
    def one(f):
        ids = jnp.maximum(f.ravel(), 0)
        hits = jnp.zeros((n_faces,), jnp.bool_).at[ids].set(True, mode="drop")
        any_bg = f.ravel() >= 0
        # face 0 may be marked by background pixels (clamped); fix by checking
        # whether face 0 is genuinely present.
        has_zero = jnp.any(f.ravel() == 0)
        hits = hits.at[0].set(has_zero)
        del any_bg
        return hits

    return jax.vmap(one)(fim)


def expand_mask_by_knn(mask: jnp.ndarray, face_k_nearest: jnp.ndarray) -> jnp.ndarray:
    """Dilate a face mask through precomputed per-face k-nearest face ids.

    Reference parity: `nmr.py:663` (`face_k_nearest[face_ids].unique()`).

    Args:
        mask: (N, F) bool; face_k_nearest: (F, K) int32.

    Returns:
        (N, F) bool: union of the k-nearest sets of all masked faces.
    """
    def one(m):
        src = jnp.where(m[:, None], face_k_nearest, -1).ravel()
        out = jnp.zeros_like(m).at[jnp.maximum(src, 0)].set(True, mode="drop")
        # Entries that were -1 scatter into face 0 spuriously; recompute face 0.
        has_zero = jnp.any((src == 0))
        return out.at[0].set(has_zero)

    return jax.vmap(one)(mask)


def select_f2pts(f2pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace non-selected faces' coords with the flow sentinel.

    Reference parity: `nmr.py:601-637` (`get_selected_f2pts` / `get_vis_f2pts`):
    unselected faces get -2 so any flow through them samples nothing.

    Args:
        f2pts: (N, F, 3, 2); mask: (N, F) bool.
    """
    return jnp.where(mask[..., None, None], f2pts, FLOW_SENTINEL)


def encode_fim(fim: jnp.ndarray, map_fn: jnp.ndarray) -> jnp.ndarray:
    """Face-index map -> part-color condition map. `nmr.py:390-401`.

    Args:
        fim: (N, S, S) int32 (-1 background).
        map_fn: (F + 1, C) color table; the last row is the background color.

    Returns:
        (N, S, S, C) condition encoding (NHWC).
    """
    n = map_fn.shape[0]
    idx = jnp.where(fim < 0, n - 1, fim)
    return jnp.take(map_fn, idx, axis=0)
