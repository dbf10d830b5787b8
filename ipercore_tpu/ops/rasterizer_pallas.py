"""Pallas TPU z-buffer rasterizer: tile-binned face-index-map kernel.

The hot geometry op of the whole framework (replaces neural_renderer's CUDA
`rasterize_face_index_map_and_weight_map`, consumed via
`ipercore_tpu.ops.rasterizer.render_fim_wim`). The pure-XLA scan in
`rasterizer.py` is the correctness reference; it moves O(F * P) barycentric
data through HBM (~43 GB/frame at 512^2) and is ~3 s/frame on a v5e. This
kernel:

  1. (XLA prep) computes per-face barycentric matrices + depth rows, bins
     faces into (8, 128)-pixel tiles by bbox overlap (one `top_k` over a
     (tiles, F) boolean), and gathers per-tile face tables;
  2. (Pallas) per pixel-tile, loops the tile's face list through VMEM in
     chunks, evaluating barycentrics on the VPU and keeping a (8, 128)
     z-buffer + tile-local winner index entirely on-chip;
  3. (XLA post) maps tile-local winners to global face ids and reconstructs
     the barycentric-weight map analytically from the winning face's matrix.

Total HBM traffic ~ (faces + per-tile tables + one (S, S) image) per frame —
three orders of magnitude below the XLA scan.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ipercore_tpu.ops.rasterizer import (
    FAR,
    NEAR,
    RasterOutput,
    _face_bary_matrices,
    _pixel_centers,
)

TILE_H = 8
TILE_W = 128
_BIG = 1e30  # python float: jnp scalars would be captured as kernel constants


def _bin_faces(face_verts: jnp.ndarray, size: int, k: int,
               extra_cols: jnp.ndarray | None = None):
    """Bin faces to pixel tiles by bbox overlap, nearest-first.

    Slots are assigned in order of increasing face min-depth, so when a tile
    overflows its k-slot capacity the *farthest* (almost surely occluded)
    faces are the ones dropped — overflow degrades to correct-or-near-correct
    pixels instead of silently losing the visible surface. The true per-tile
    load is returned so callers can detect overflow (`max_tile_load > k`).

    Args:
        extra_cols: optional (F, E) columns appended to each face's param row
            BEFORE the per-tile gather — a (1, W) row gather costs one VMEM
            tile read per index regardless of W, so fusing the aux columns
            into the same gather halves the binning's HBM traffic.

    Returns:
        params: (n_tiles, k, 16 + E) f32 — barycentric matrix rows (9) +
            per-vertex depth (3) + NDC bbox (4) [+ extra_cols] per face;
        ids: (n_tiles, k) int32 global face id (for unbinned slots: arbitrary);
        mask: (n_tiles, k) bool — slot holds a real overlapping face;
        true_counts: (n_tiles,) int32 — overlapping faces per tile BEFORE the
            k cap (overflow iff > k).
    """
    S = size
    gy, gx = S // TILE_H, S // TILE_W
    n_tiles = gy * gx

    M, valid = _face_bary_matrices(face_verts)  # (F, 3, 3), (F,)
    z = face_verts[..., 2]  # (F, 3)
    x = face_verts[..., 0]
    y = face_verts[..., 1]

    # face bbox in pixel units: px = (x + 1) * S/2 - 0.5
    def to_px(v):
        return (v + 1.0) * (S * 0.5) - 0.5

    x0 = to_px(jnp.min(x, axis=-1))
    x1 = to_px(jnp.max(x, axis=-1))
    y0 = to_px(jnp.min(y, axis=-1))
    y1 = to_px(jnp.max(y, axis=-1))

    # tile index ranges covered by the bbox (conservative: +/- 1 px)
    tx0 = jnp.clip(jnp.floor((x0 - 1) / TILE_W), 0, gx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x1 + 1) / TILE_W), 0, gx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y0 - 1) / TILE_H), 0, gy - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y1 + 1) / TILE_H), 0, gy - 1).astype(jnp.int32)

    tys = jnp.arange(gy, dtype=jnp.int32)
    txs = jnp.arange(gx, dtype=jnp.int32)
    oy = (tys[:, None] >= ty0[None, :]) & (tys[:, None] <= ty1[None, :])  # (gy, F)
    ox = (txs[:, None] >= tx0[None, :]) & (txs[:, None] <= tx1[None, :])  # (gx, F)
    overlap = oy[:, None, :] & ox[None, :, :]  # (gy, gx, F)
    overlap = overlap & valid[None, None, :]
    overlap = overlap.reshape(n_tiles, -1)

    true_counts = jnp.sum(overlap, axis=1).astype(jnp.int32)  # (n_tiles,)

    F = overlap.shape[1]
    # Nearest-first priority: rank faces by min vertex depth (ascending) and
    # give nearer faces higher top_k scores, so the k binned faces per tile
    # are the k nearest — overflow drops far/occluded faces first.
    minz = jnp.min(z, axis=-1)
    order = jnp.argsort(minz)  # (F,) nearest first
    prio = jnp.zeros((F,), jnp.int32).at[order].set(
        jnp.arange(F, 0, -1, dtype=jnp.int32))  # nearest -> F, farthest -> 1
    if overlap.shape[1] < k:  # pad face axis so k faces can always be binned
        overlap = jnp.pad(overlap, ((0, 0), (0, k - overlap.shape[1])))
        prio = jnp.pad(prio, (0, k - prio.shape[0]))
    score, ids = jax.lax.top_k(
        overlap.astype(jnp.int32) * prio[None, :], k)  # (n_tiles, k)
    ids = jnp.minimum(ids, F - 1)
    mask = score > 0
    ids = ids.astype(jnp.int32)

    # params rows: [M 9 | z 3 | bbox 4 (xmin, xmax, ymin, ymax in NDC)]
    bbox = jnp.stack(
        [jnp.min(x, -1), jnp.max(x, -1), jnp.min(y, -1), jnp.max(y, -1)], axis=-1)
    params = jnp.concatenate([M.reshape(-1, 9), z, bbox], axis=-1)  # (F, 16)
    if extra_cols is not None:
        params = jnp.concatenate([params, extra_cols], axis=-1)
    tile_params = jnp.take(params, ids, axis=0)  # (n_tiles, k, 16 + E)
    return tile_params, ids, mask, true_counts


def _raster_kernel(count_ref, params_ref, mask_ref, local_ref, zout_ref, *, size, k, chunk, gx_tiles):
    """One pixel tile: z-buffer its face list.

    count_ref: (n_tiles,) int32 scalar-prefetch — faces per tile list (the
        loop runs ceil(count/chunk) steps: tiles average ~100 faces out of
        k=2048 capacity, so the dynamic bound cuts ~95% of the work);
    params_ref: (1, k, 16) VMEM; mask_ref: (1, k, 1) f32 VMEM (1.0 = real);
    local_ref: (TILE_H, TILE_W) int32 out — tile-local winner index or -1;
    zout_ref: (TILE_H, TILE_W) f32 out — winning depth (inf = background).
    """
    gy = pl.program_id(0)
    gx = pl.program_id(1)

    S = size
    # pixel NDC coords of this tile (iota must be integer on TPU)
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    py = (gy * TILE_H + row) * (2.0 / S) + (1.0 - S) / S
    px = (gx * TILE_W + col) * (2.0 / S) + (1.0 - S) / S

    count = count_ref[gy * gx_tiles + gx]
    n_chunks = (count + (chunk - 1)) // chunk  # dynamic trip count

    def body(ci, carry):
        best_z, best_i = carry
        p = params_ref[0, pl.ds(ci * chunk, chunk), :]  # (chunk, 12)
        m = mask_ref[0, pl.ds(ci * chunk, chunk), 0]  # (chunk,)

        def bary(j):
            a = p[:, 3 * j + 0][:, None, None]
            b = p[:, 3 * j + 1][:, None, None]
            c = p[:, 3 * j + 2][:, None, None]
            return a * px[None] + b * py[None] + c  # (chunk, TH, TW)

        w0, w1, w2 = bary(0), bary(1), bary(2)
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        # per-face bbox guard (+1 px): sliver faces must not claim far pixels
        eps_px = 2.0 / S
        in_bbox = (
            (px[None] >= p[:, 12][:, None, None] - eps_px)
            & (px[None] <= p[:, 13][:, None, None] + eps_px)
            & (py[None] >= p[:, 14][:, None, None] - eps_px)
            & (py[None] <= p[:, 15][:, None, None] + eps_px)
        )
        inside = inside & in_bbox
        depth = (
            w0 * p[:, 9][:, None, None]
            + w1 * p[:, 10][:, None, None]
            + w2 * p[:, 11][:, None, None]
        )
        ok = inside & (m > 0)[:, None, None] & (depth > NEAR) & (depth < FAR)
        depth = jnp.where(ok, depth, _BIG)

        zmin = jnp.min(depth, axis=0)  # (TH, TW)
        amin = jnp.argmin(depth, axis=0).astype(jnp.int32)  # (TH, TW)
        take = zmin < best_z
        best_z = jnp.where(take, zmin, best_z)
        best_i = jnp.where(take, ci * chunk + amin, best_i)
        return best_z, best_i

    init = (
        jnp.full((TILE_H, TILE_W), _BIG, jnp.float32),
        jnp.full((TILE_H, TILE_W), -1, jnp.int32),
    )
    best_z, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    local_ref[:, :] = jnp.where(best_z < _BIG, best_i, -1)
    zout_ref[:, :] = best_z


@functools.partial(jax.jit, static_argnames=("size", "k", "chunk", "interpret", "with_stats"))
def rasterize_pallas(
    face_verts: jnp.ndarray,
    size: int,
    k: int = 2048,
    chunk: int = 128,
    interpret: bool = False,
    with_stats: bool = False,
) -> RasterOutput:
    """Tile-binned Pallas rasterization of one frame.

    Args:
        face_verts: (F, 3, 3) projected faces (same contract as
            `rasterizer.rasterize`).
        size: image size S (multiple of 128).
        k: max faces binned per (8, 128) tile. Binning is nearest-first, so
            beyond-k overflow drops the farthest (occluded) faces; detect it
            via `with_stats`.
        chunk: faces per VMEM processing step (divides k).
        with_stats: also return {"max_tile_load", "n_overflow_tiles"} so
            callers/benches can assert k is adequate.

    Returns:
        RasterOutput(fim (S, S) int32, wim (S, S, 3) f32) [, stats dict].
    """
    S = size
    assert S % TILE_W == 0 and S % TILE_H == 0, "size must be a multiple of 128"
    gy, gx = S // TILE_H, S // TILE_W
    n_tiles = gy * gx

    tile_params, ids, mask, true_counts = _bin_faces(face_verts, size, k)
    maskf = mask.astype(jnp.float32)[..., None]  # (n_tiles, k, 1)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)  # (n_tiles,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((1, k, 16), lambda i, j, counts: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i, j, counts: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, counts: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, counts: (i, j),
                         memory_space=pltpu.VMEM),
        ),
    )
    local, best_z = pl.pallas_call(
        functools.partial(_raster_kernel, size=size, k=k, chunk=chunk, gx_tiles=gx),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S, S), jnp.int32),
            jax.ShapeDtypeStruct((S, S), jnp.float32),
        ),
        interpret=interpret,
    )(counts, tile_params, maskf)

    # map tile-local winner -> global face id
    local_tiles = local.reshape(gy, TILE_H, gx, TILE_W).transpose(0, 2, 1, 3)
    local_flat = local_tiles.reshape(n_tiles, TILE_H * TILE_W)
    safe_local = jnp.maximum(local_flat, 0)
    fid_flat = jnp.take_along_axis(ids, safe_local, axis=1)
    fid_flat = jnp.where(local_flat >= 0, fid_flat, -1)
    fim = (
        fid_flat.reshape(gy, gx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(S, S)
    )

    # reconstruct wim analytically: w = M[fim] @ (x, y, 1)
    M, _ = _face_bary_matrices(face_verts)
    pix = _pixel_centers(S, face_verts.dtype)  # (P, 3)
    Mw = jnp.take(M, jnp.maximum(fim.ravel(), 0), axis=0)  # (P, 3, 3)
    wim = jnp.einsum("pab,pb->pa", Mw, pix,
                     precision=jax.lax.Precision.HIGHEST)
    wim = jnp.where((fim.ravel() >= 0)[:, None], wim, 0.0).reshape(S, S, 3)
    out = RasterOutput(fim=fim, wim=wim)
    if with_stats:
        stats = {
            "max_tile_load": jnp.max(true_counts),
            "n_overflow_tiles": jnp.sum(true_counts > k),
        }
        return out, stats
    return out


def rasterize_pallas_batch(face_verts: jnp.ndarray, size: int, k: int = 2048,
                           chunk: int = 128, interpret: bool = False) -> RasterOutput:
    """vmap over a leading batch axis. face_verts: (N, F, 3, 3)."""
    return jax.vmap(
        lambda fv: rasterize_pallas(fv, size, k=k, chunk=chunk, interpret=interpret)
    )(face_verts)


# ---------------------------------------------------------------------------
# Fused raster + flow kernel
# ---------------------------------------------------------------------------


def _raster_flow_kernel(count_ref, params_ref, mask_ref, local_ref, flow_ref,
                        *, size, k, chunk, gx_tiles, n_flows):
    """Z-buffer + per-pixel flow emission in one pass.

    Extends `_raster_kernel`: each face row additionally carries `n_flows`
    auxiliary per-vertex 2D coordinate sets (source-pose screen coords, UV
    coords, ...). Per chunk, flow candidates are evaluated for every face and
    the chunk winner's flows are extracted with a one-hot masked reduction
    (all shapes stay 2D (TH, TW) — Mosaic does not flatten tiles) — replacing
    the full-resolution `cal_bc_transform` gathers entirely.

    params row layout: [M 9 | z 3 | bbox 4 | aux 6*n_flows].
    flow_ref: (TILE_H, TILE_W, 2*n_flows) f32 out (FLOW_SENTINEL outside).
    """
    from ipercore_tpu.ops.rasterizer import FLOW_SENTINEL

    gy = pl.program_id(0)
    gx = pl.program_id(1)
    S = size

    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    py = (gy * TILE_H + row) * (2.0 / S) + (1.0 - S) / S
    px = (gx * TILE_W + col) * (2.0 / S) + (1.0 - S) / S

    count = count_ref[gy * gx_tiles + gx]
    n_chunks = (count + (chunk - 1)) // chunk

    def body(ci, carry):
        best_z, best_i, best_flow = carry
        p = params_ref[0, pl.ds(ci * chunk, chunk), :]  # (chunk, row_w)
        m = mask_ref[0, pl.ds(ci * chunk, chunk), 0]  # (chunk,)

        def bary(j):
            a = p[:, 3 * j + 0][:, None, None]
            b = p[:, 3 * j + 1][:, None, None]
            c = p[:, 3 * j + 2][:, None, None]
            return a * px[None] + b * py[None] + c

        w0, w1, w2 = bary(0), bary(1), bary(2)
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        eps_px = 2.0 / S
        in_bbox = (
            (px[None] >= p[:, 12][:, None, None] - eps_px)
            & (px[None] <= p[:, 13][:, None, None] + eps_px)
            & (py[None] >= p[:, 14][:, None, None] - eps_px)
            & (py[None] <= p[:, 15][:, None, None] + eps_px)
        )
        inside = inside & in_bbox
        depth = (
            w0 * p[:, 9][:, None, None]
            + w1 * p[:, 10][:, None, None]
            + w2 * p[:, 11][:, None, None]
        )
        ok = inside & (m > 0)[:, None, None] & (depth > NEAR) & (depth < FAR)
        depth = jnp.where(ok, depth, _BIG)

        zmin = jnp.min(depth, axis=0)  # (TH, TW)
        amin = jnp.argmin(depth, axis=0).astype(jnp.int32)  # (TH, TW)

        # one-hot over the chunk axis for the per-pixel winner
        cids = jax.lax.broadcasted_iota(jnp.int32, (chunk, TILE_H, TILE_W), 0)
        onehot = (cids == amin[None]).astype(jnp.float32)  # (chunk, TH, TW)

        # chunk-winner flow candidates: barycentric blend of aux coords,
        # evaluated per face then reduced through the one-hot
        cand_flows = []
        for j in range(n_flows):
            base = 16 + 6 * j
            fx = (w0 * p[:, base + 0][:, None, None]
                  + w1 * p[:, base + 2][:, None, None]
                  + w2 * p[:, base + 4][:, None, None])
            fy = (w0 * p[:, base + 1][:, None, None]
                  + w1 * p[:, base + 3][:, None, None]
                  + w2 * p[:, base + 5][:, None, None])
            cand_flows.append(jnp.sum(onehot * fx, axis=0))
            cand_flows.append(jnp.sum(onehot * fy, axis=0))
        cand_flow = jnp.stack(cand_flows, axis=-1)  # (TH, TW, 2J)

        take = zmin < best_z  # (TH, TW)
        best_z = jnp.where(take, zmin, best_z)
        best_i = jnp.where(take, ci * chunk + amin, best_i)
        # bool minor-dim expansion is unsupported on TPU — blend via f32 mask
        takef = take.astype(jnp.float32)[..., None]
        best_flow = takef * cand_flow + (1.0 - takef) * best_flow
        return best_z, best_i, best_flow

    init = (
        jnp.full((TILE_H, TILE_W), _BIG, jnp.float32),
        jnp.full((TILE_H, TILE_W), -1, jnp.int32),
        jnp.zeros((TILE_H, TILE_W, 2 * n_flows), jnp.float32),
    )
    best_z, best_i, best_flow = jax.lax.fori_loop(0, n_chunks, body, init)

    hit = best_z < _BIG
    local_ref[:, :] = jnp.where(hit, best_i, -1)
    hitf = hit.astype(jnp.float32)[..., None]
    flow_ref[:, :, :] = hitf * best_flow + (1.0 - hitf) * FLOW_SENTINEL


# ---------------------------------------------------------------------------
# CSR (sort-based) binning + manual-DMA kernel
# ---------------------------------------------------------------------------
#
# The top_k binning above costs ~10 ms/frame at 512^2 (5.6 ms top_k over a
# (n_tiles, F) score matrix + 4.4 ms gathering (n_tiles, k) fixed-capacity
# face tables, k=2048 being ~20x the average tile load). The CSR variant
# sorts face->tile entries by tile id instead: the sorted array IS the
# per-tile face lists laid out contiguously, so the kernel DMAs each tile's
# exact segment from HBM (double-buffered) and no fixed-k table, no top_k
# and no overflow cap exist at all. Measured ~2.5 ms/frame for the same
# binning work.


def _bin_faces_csr(face_verts: jnp.ndarray, size: int, entries_per_face: int,
                   ncap: int, chunk: int, extra_cols: jnp.ndarray | None = None,
                   tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Sort-based CSR face binning.

    Each face contributes up to `entries_per_face` (tile, face) entries (its
    bbox's tile span, row-major; spans beyond the cap are truncated — see
    stats). Entries are key-sorted by `tile_id * F + face_id`, making every
    tile's face list a contiguous, face-id-ordered segment of one flat array.

    Returns:
        rows: (ncap + 2 * chunk, W) f32 — per-entry param rows ([M 9 | z 3 |
            bbox 4 | extra_cols]) in sorted order, tail-padded so the kernel
            can always DMA a full chunk (incl. the double-buffer prefetch);
        fids: (ncap,) int32 global face id per sorted entry;
        seg: (n_tiles,) int32 segment start of each tile's list;
        counts: (n_tiles,) int32 faces per tile;
        stats: dict with `max_span` (largest per-face tile span; truncation
            iff > entries_per_face) and `total_entries` (real entries;
            truncation iff > ncap).
    """
    S = size
    gy, gx = S // tile_h, S // tile_w
    n_tiles = gy * gx
    E = entries_per_face

    M, valid = _face_bary_matrices(face_verts)  # (F, 3, 3), (F,)
    z = face_verts[..., 2]
    x = face_verts[..., 0]
    y = face_verts[..., 1]
    F = face_verts.shape[0]

    def to_px(v):
        return (v + 1.0) * (S * 0.5) - 0.5

    tx0 = jnp.clip(jnp.floor((to_px(jnp.min(x, -1)) - 1) / tile_w), 0, gx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((to_px(jnp.max(x, -1)) + 1) / tile_w), 0, gx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((to_px(jnp.min(y, -1)) - 1) / tile_h), 0, gy - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((to_px(jnp.max(y, -1)) + 1) / tile_h), 0, gy - 1).astype(jnp.int32)

    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    span = jnp.where(valid, ntx * nty, 0)  # (F,)

    # enumerate the span row-major: entry e of face f covers tile
    # (ty0 + e // ntx, tx0 + e % ntx) while e < span
    e = jnp.arange(E, dtype=jnp.int32)[None, :]  # (1, E)
    dy = e // ntx[:, None]
    dx = e - dy * ntx[:, None]
    tid = (ty0[:, None] + dy) * gx + (tx0[:, None] + dx)  # (F, E)
    live = e < jnp.minimum(span, E)[:, None]
    # sort key: tile-major, face-id-minor (deterministic z-tie order);
    # sentinel entries get tid == n_tiles and sort past every real segment
    fid = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None], (F, E))
    key = jnp.where(live, tid * F + fid, n_tiles * F)
    key = jnp.sort(key.reshape(-1))[:ncap]  # (ncap,)

    tids = key // F  # (ncap,) tile id per sorted entry (n_tiles = sentinel)
    fids = jnp.where(tids < n_tiles, key - tids * F, 0).astype(jnp.int32)

    seg_all = jnp.searchsorted(
        tids, jnp.arange(n_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    seg, counts = seg_all[:-1], seg_all[1:] - seg_all[:-1]

    bbox = jnp.stack(
        [jnp.min(x, -1), jnp.max(x, -1), jnp.min(y, -1), jnp.max(y, -1)], axis=-1)
    params = jnp.concatenate([M.reshape(-1, 9), z, bbox], axis=-1)  # (F, 16)
    if extra_cols is not None:
        params = jnp.concatenate([params, extra_cols], axis=-1)
    # minor dim padded to the (1, 128) HBM tiling so the kernel's dynamic
    # DMA slices are lane-aligned (Mosaic requirement). Padding the small
    # (F, W) table BEFORE the gather fuses the pad into the gather's output
    # (saves a full read+write pass over the (ncap, 128) array).
    W = params.shape[1]
    w_pad = -W % 128
    rows = jnp.take(jnp.pad(params, ((0, 0), (0, w_pad))), fids, axis=0)
    # 2 chunks of tail padding: the kernel's unconditional double-buffer
    # prefetch reads up to one chunk past the last processed chunk
    rows = jnp.pad(rows, ((0, 2 * chunk), (0, 0)))

    stats = {"max_span": jnp.max(span), "total_entries": jnp.sum(span)}
    return rows, fids, seg, counts, stats


def _raster_flow_kernel_csr(seg_ref, cnt_ref, rows_hbm, local_ref, flow_ref,
                            scratch, sem, *, size, chunk, gx_tiles, n_tiles,
                            n_flows, frame_rows, th=TILE_H, tw=TILE_W):
    """CSR z-buffer + flow kernel: one (frame, pixel-tile) per grid step.

    The tile's face list lives at rows_hbm[f, seg : seg + count]; chunks are
    double-buffered HBM->VMEM with `make_async_copy` so the DMA of chunk
    ci+1 overlaps the VPU work on chunk ci. Same per-chunk math as
    `_raster_flow_kernel`.
    """
    from ipercore_tpu.ops.rasterizer import FLOW_SENTINEL

    f = pl.program_id(0)
    gy = pl.program_id(1)
    gx = pl.program_id(2)
    S = size

    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    py = (gy * th + row) * (2.0 / S) + (1.0 - S) / S
    px = (gx * tw + col) * (2.0 / S) + (1.0 - S) / S

    t = f * n_tiles + gy * gx_tiles + gx
    base = seg_ref[t]
    count = cnt_ref[t]
    n_chunks = (count + (chunk - 1)) // chunk

    # rows_hbm is flattened to ((T * (ncap + chunk)), W): dynamic DMA slices
    # on the major dim lower cleanly for any offset (Mosaic rejects dynamic
    # second-minor slices of a 3D HBM ref)
    frame_base = f * frame_rows + base

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(frame_base + ci * chunk, chunk), :],
            scratch.at[slot],
            sem.at[slot],
        )

    # Double buffering with UNCONDITIONAL starts/waits: on this TPU stack a
    # `pl.when`-guarded DMA start or wait inside (or after) the chunk loop
    # deadlocks at runtime, so chunk ci+1 is always prefetched (one chunk of
    # tail padding in rows_hbm keeps the reads in bounds) and the final
    # prefetch is drained after the loop. Every start is waited exactly once
    # for every count >= 0.
    get_dma(0, 0).start()

    eps_px = 2.0 / S
    cids1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)  # (chunk, 1)

    fid_col = 16 + 6 * n_flows  # global face id as an f32 param column

    def body(ci, carry):
        best_z, best_fid, best_flow = carry
        slot = jax.lax.rem(ci, 2)
        get_dma(1 - slot, ci + 1).start()  # prefetch; drained after the loop
        get_dma(slot, ci).wait()
        p = scratch[slot]  # (chunk, W)
        m = (ci * chunk + cids1[:, 0]) < count  # (chunk,) rows of THIS tile

        def bary(j):
            a = p[:, 3 * j + 0][:, None, None]
            b = p[:, 3 * j + 1][:, None, None]
            c = p[:, 3 * j + 2][:, None, None]
            return a * px[None] + b * py[None] + c

        w0, w1, w2 = bary(0), bary(1), bary(2)
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        in_bbox = (
            (px[None] >= p[:, 12][:, None, None] - eps_px)
            & (px[None] <= p[:, 13][:, None, None] + eps_px)
            & (py[None] >= p[:, 14][:, None, None] - eps_px)
            & (py[None] <= p[:, 15][:, None, None] + eps_px)
        )
        inside = inside & in_bbox
        depth = (
            w0 * p[:, 9][:, None, None]
            + w1 * p[:, 10][:, None, None]
            + w2 * p[:, 11][:, None, None]
        )
        ok = inside & m[:, None, None] & (depth > NEAR) & (depth < FAR)
        depth = jnp.where(ok, depth, _BIG)

        zmin = jnp.min(depth, axis=0)
        amin = jnp.argmin(depth, axis=0).astype(jnp.int32)

        cids = jax.lax.broadcasted_iota(jnp.int32, (chunk, th, tw), 0)
        onehot = (cids == amin[None]).astype(jnp.float32)

        cand_flows = []
        for j in range(n_flows):
            b0 = 16 + 6 * j
            fx = (w0 * p[:, b0 + 0][:, None, None]
                  + w1 * p[:, b0 + 2][:, None, None]
                  + w2 * p[:, b0 + 4][:, None, None])
            fy = (w0 * p[:, b0 + 1][:, None, None]
                  + w1 * p[:, b0 + 3][:, None, None]
                  + w2 * p[:, b0 + 5][:, None, None])
            cand_flows.append(jnp.sum(onehot * fx, axis=0))
            cand_flows.append(jnp.sum(onehot * fy, axis=0))
        cand_flow = jnp.stack(cand_flows, axis=-1)
        # winner's global face id (exact in f32: ids < 2^24) — emitting it
        # here kills the (S*S)-scalar post-kernel id gather entirely
        cand_fid = jnp.sum(onehot * p[:, fid_col][:, None, None], axis=0)

        take = zmin < best_z
        best_z = jnp.where(take, zmin, best_z)
        takef = take.astype(jnp.float32)
        best_fid = takef * cand_fid + (1.0 - takef) * best_fid
        best_flow = takef[..., None] * cand_flow + (1.0 - takef[..., None]) * best_flow
        return best_z, best_fid, best_flow

    init = (
        jnp.full((th, tw), _BIG, jnp.float32),
        jnp.full((th, tw), -1.0, jnp.float32),
        jnp.zeros((th, tw, 2 * n_flows), jnp.float32),
    )
    best_z, best_fid, best_flow = jax.lax.fori_loop(0, n_chunks, body, init)

    # drain the last prefetch (started for ci+1 == n_chunks; for empty tiles
    # this pairs with the unconditional warm-up start of chunk 0)
    get_dma(jax.lax.rem(n_chunks, 2), n_chunks).wait()

    hit = best_z < _BIG
    local_ref[0] = jnp.where(hit, (best_fid + 0.5).astype(jnp.int32), -1)
    hitf = hit.astype(jnp.float32)[..., None]
    flow_ref[0] = hitf * best_flow + (1.0 - hitf) * FLOW_SENTINEL


@functools.partial(
    jax.jit,
    static_argnames=("size", "entries_per_face", "ncap_per_face", "chunk",
                     "interpret", "with_stats", "tile_h", "tile_w"))
def rasterize_flows_pallas_csr(
    face_verts: jnp.ndarray,
    aux_pts: jnp.ndarray,
    size: int,
    entries_per_face: int = 16,
    ncap_per_face: int = 8,
    chunk: int = 128,
    interpret: bool = False,
    with_stats: bool = False,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
):
    """Batched CSR rasterize + flows: the imitator's hot geometry op.

    Args:
        face_verts: (T, F, 3, 3) projected target-pose faces (batched).
        aux_pts: (J, F, 3, 2) per-flow-set source coordinates (shared
            across the batch: UV template coords + per-source screen coords),
            or (T, J, F, 3, 2) when a flow set varies per frame (temporal
            mode's previous-frame coordinates).
        entries_per_face: static cap on tiles one face may cover (its bbox
            span, truncated row-major beyond the cap). 16 covers faces up to
            ~4 tile rows x 4 cols; `with_stats` reports the true max span.
        ncap_per_face: total entry capacity as a multiple of F (average
            span budget). 8 is ~2.5x the worst body-mesh average observed.

    Returns:
        (fim (T, S, S) int32, flows (T, S, S, J, 2) f32)[, stats] — same
        contract as vmapped `rasterize_flows_pallas`; stats flag truncation
        (`max_span > entries_per_face` or `total_entries > ncap`).
    """
    S = size
    assert S % tile_w == 0 and S % tile_h == 0, "size must be a tile multiple"
    gy, gx = S // tile_h, S // tile_w
    n_tiles = gy * gx
    T, F = face_verts.shape[0], face_verts.shape[1]
    per_frame_aux = aux_pts.ndim == 5
    J = aux_pts.shape[1] if per_frame_aux else aux_pts.shape[0]
    W = 16 + 6 * J + 1  # + the fid column
    W_pad = W + (-W % 128)
    # total entries can never exceed F * entries_per_face
    ncap = min(ncap_per_face, entries_per_face) * F

    fid_col = jnp.arange(F, dtype=jnp.float32)[:, None]

    def flat_aux(a):  # (J, F, 3, 2) -> (F, 6J + 1) with the fid column
        af = jnp.transpose(a, (1, 0, 2, 3)).reshape(F, J * 6)
        return jnp.concatenate([af, fid_col], axis=-1)

    bin_one = lambda fv, af: _bin_faces_csr(
        fv, S, entries_per_face, ncap, chunk, extra_cols=af,
        tile_h=tile_h, tile_w=tile_w)
    if per_frame_aux:
        rows, fids, seg, counts, stats = jax.vmap(
            lambda fv, a: bin_one(fv, flat_aux(a)))(face_verts, aux_pts)
    else:
        aux_flat = flat_aux(aux_pts)
        rows, fids, seg, counts, stats = jax.vmap(
            lambda fv: bin_one(fv, aux_flat))(face_verts)
    # rows: (T, ncap + chunk, W); seg/counts: (T, n_tiles); fids: (T, ncap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, tile_h, tile_w), lambda f, i, j, *_: (f, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile_w, 2 * J),
                         lambda f, i, j, *_: (f, i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, W_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    frame_rows = ncap + 2 * chunk
    local, flow = pl.pallas_call(
        functools.partial(_raster_flow_kernel_csr, size=size, chunk=chunk,
                          gx_tiles=gx, n_tiles=n_tiles, n_flows=J,
                          frame_rows=frame_rows, th=tile_h, tw=tile_w),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, S, S), jnp.int32),
            jax.ShapeDtypeStruct((T, S, S, 2 * J), jnp.float32),
        ),
        interpret=interpret,
    )(seg.reshape(-1), counts.reshape(-1), rows.reshape(T * frame_rows, W_pad))

    fim = local  # the kernel already emits global face ids (fid column)
    flows = flow.reshape(T, S, S, J, 2)
    if with_stats:
        return fim, flows, jax.tree_util.tree_map(jnp.max, stats)
    return fim, flows


@functools.partial(jax.jit, static_argnames=("size", "k", "chunk", "interpret"))
def rasterize_flows_pallas(
    face_verts: jnp.ndarray,
    aux_pts: jnp.ndarray,
    size: int,
    k: int = 2048,
    chunk: int = 128,
    interpret: bool = False,
):
    """Rasterize + emit per-pixel flows for J auxiliary coordinate sets.

    Args:
        face_verts: (F, 3, 3) projected target-pose faces.
        aux_pts: (J, F, 3, 2) per-flow-set per-face-vertex source coordinates
            (e.g. UV template coords, each source pose's screen coords).

    Returns:
        (fim (S, S) int32, flows (S, S, J, 2) f32 — FLOW_SENTINEL on bg).

    Replaces raster + J x `cal_bc_transform` with one kernel pass.
    """
    S = size
    gy, gx = S // TILE_H, S // TILE_W
    n_tiles = gy * gx
    J = aux_pts.shape[0]

    # aux columns: (J, F, 3, 2) -> (F, 6J) as [x0 y0 x1 y1 x2 y2] per flow
    # set, fused into the binning gather (one take instead of two)
    aux_flat = jnp.transpose(aux_pts, (1, 0, 2, 3)).reshape(aux_pts.shape[1], J * 6)
    tile_params, ids, mask, _true_counts = _bin_faces(
        face_verts, size, k, extra_cols=aux_flat)
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)
    maskf = mask.astype(jnp.float32)[..., None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((1, k, 16 + 6 * J), lambda i, j, counts: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i, j, counts: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, counts: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W, 2 * J), lambda i, j, counts: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    local, flow = pl.pallas_call(
        functools.partial(_raster_flow_kernel, size=size, k=k, chunk=chunk,
                          gx_tiles=gx, n_flows=J),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S, S), jnp.int32),
            jax.ShapeDtypeStruct((S, S, 2 * J), jnp.float32),
        ),
        interpret=interpret,
    )(counts, tile_params, maskf)

    # map tile-local winner -> global face id (for the cond encoding)
    local_tiles = local.reshape(gy, TILE_H, gx, TILE_W).transpose(0, 2, 1, 3)
    local_flat = local_tiles.reshape(n_tiles, TILE_H * TILE_W)
    safe_local = jnp.maximum(local_flat, 0)
    fid_flat = jnp.take_along_axis(ids, safe_local, axis=1)
    fid_flat = jnp.where(local_flat >= 0, fid_flat, -1)
    fim = (fid_flat.reshape(gy, gx, TILE_H, TILE_W).transpose(0, 2, 1, 3)
           .reshape(S, S))
    flows = flow.reshape(S, S, J, 2)
    return fim, flows
