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
    params, ids, mask = _bin_faces(fv, 128, k=128)
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
