import numpy as np
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.models.mesh import load_assets

S = 64
BS, NS, NT = 1, 2, 2


@pytest.fixture(scope="module")
def composer():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    return fc.make_composer(model, assets, image_size=S, out_dilate_ks=11)


def _theta(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.zeros((n, 85), np.float32)
    t[:, 0] = 1.2  # cam scale
    t[:, 3:75] = rng.randn(n, 72) * 0.05
    t[:, 75:] = rng.randn(n, 10) * 0.3
    return jnp.asarray(t)


def test_render_smpl_info_shapes(composer):
    theta = _theta(NS)
    d = smpl_mod.get_details(composer.model, theta)
    info = fc.render_smpl_info(composer, d["verts"], d["cam"], use_morph=True)
    assert info["f2pts"].shape == (NS, composer.model.faces.shape[0], 3, 2)
    assert info["fim"].shape == (NS, S, S)
    assert info["cond"].shape == (NS, S, S, 3)
    assert info["vis_mask"].shape == (NS, composer.model.faces.shape[0])
    assert info["confidant_sil"].shape == (NS, S, S, 1)
    vis = np.asarray(info["vis_mask"])
    assert 0 < vis.sum() < vis.size


def test_uv_img_covers_uv_space(composer):
    theta = _theta(BS * NS)
    d = smpl_mod.get_details(composer.model, theta)
    info = fc.render_smpl_info(composer, d["verts"], d["cam"], use_morph=True)
    rng = np.random.RandomState(0)
    src_img = jnp.asarray(rng.uniform(-1, 1, (BS, NS, S, S, 3)), jnp.float32)
    uv = fc.make_uv_img(composer, src_img, info)
    assert uv.shape == (BS, S, S, 3)
    assert np.isfinite(np.asarray(uv)).all()


def test_full_forward_contract(composer):
    rng = np.random.RandomState(1)
    src_img = jnp.asarray(rng.uniform(-1, 1, (BS, NS, S, S, 3)), jnp.float32)
    ref_img = jnp.asarray(rng.uniform(-1, 1, (BS, NT, S, S, 3)), jnp.float32)
    src_smpl = _theta(BS * NS).reshape(BS, NS, 85)
    ref_smpl = _theta(BS * NT, seed=2).reshape(BS, NT, 85)
    out = fc.forward(composer, src_img, ref_img, src_smpl, ref_smpl, temporal=True)
    assert out["input_G_bg"].shape == (BS, 1, S, S, 4)
    assert out["input_G_src"].shape == (BS, NS, S, S, 6)
    assert out["input_G_tsf"].shape == (BS, NT, S, S, 6)
    assert out["Tst"].shape == (BS, NT, NS, S, S, 2)
    assert out["Ttt"].shape == (BS, NT - 1, S, S, 2)
    # flows are either the sentinel or within [-1, 1]
    Tst = np.asarray(out["Tst"])
    valid = Tst != fc.rz.FLOW_SENTINEL
    assert np.abs(Tst[valid]).max() <= 1.5


def test_identity_flow_roundtrip(composer):
    """Same pose as source and target => warping the source through Tst
    approximately reproduces the source body pixels."""
    theta = _theta(1, seed=3)
    d = smpl_mod.get_details(composer.model, theta)
    info = fc.render_smpl_info(composer, d["verts"], d["cam"], use_morph=True)
    Tst, _ = fc.make_trans_flow(composer, info, info, bs=1, ns=1)
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32)
    from ipercore_tpu.ops.sampling import grid_sample

    warped = np.asarray(grid_sample(img, Tst[:, 0]))
    fim = np.asarray(info["fim"][0])
    body = fim >= 0
    err = np.abs(warped[0][body] - np.asarray(img)[0][body])
    assert np.median(err) < 0.1


def test_boundary_fill_fills_ring():
    img = np.zeros((1, 16, 16, 3), np.float32)
    img[0, :, :8] = 1.0
    known = np.zeros((1, 16, 16, 1), np.float32)
    known[0, :, :8] = 1.0
    target = np.zeros_like(known)
    target[0, :, 8:10] = 1.0
    out = np.asarray(fc.boundary_fill(jnp.asarray(img), jnp.asarray(known), jnp.asarray(target), iters=4))
    np.testing.assert_allclose(out[0, :, 8:10], 1.0, atol=1e-4)
    np.testing.assert_allclose(out[0, :, 12:], 0.0, atol=1e-6)


def test_morph_fill_covers_wide_ring_512():
    """At the deploy default out_dilate_ks=51 the uncertain ring is up to
    ~26 px wide at 512^2; every ring pixel must be assigned (the reference's
    top-k nearest fill, `flowcomposition.py:296-386`, always assigns)."""
    S2 = 512
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    comp = fc.make_composer(model, assets, image_size=S2, out_dilate_ks=51)

    # Synthetic silhouette: a disc. confidant = erode(disc), ring = dilate(disc)
    # minus confidant — exactly how render_smpl_info builds the masks.
    yy, xx = np.mgrid[0:S2, 0:S2]
    disc = (((yy - 256) ** 2 + (xx - 256) ** 2) < 120 ** 2).astype(np.float32)
    sil = jnp.asarray(disc)[None, :, :, None]
    from ipercore_tpu.ops.morphology import dilate, erode

    confidant = erode(sil, comp.conf_erode_ks)
    outpad = dilate(sil, comp.out_dilate_ks)
    uncertain = np.asarray(jnp.clip(outpad * (1 - confidant), 0, 1))

    img = jnp.asarray(np.full((1, S2, S2, 3), 0.5, np.float32))
    out = np.asarray(fc.boundary_fill(
        img, confidant, jnp.asarray(uncertain), iters=fc.morph_fill_iters(comp)))
    ring = uncertain[0, ..., 0] > 0
    # Every ring pixel filled with the diffused constant color => exactly 0.5.
    assert ring.sum() > 0
    np.testing.assert_allclose(out[0, ..., 0][ring], 0.5, atol=1e-3)
    # And nothing outside confidant+ring is touched.
    outside = np.asarray(1 - np.asarray(outpad))[0, ..., 0] > 0
    np.testing.assert_allclose(out[0, ..., 0][outside], 0.0, atol=1e-6)


def test_swapper_selected_f2pts_and_merge(composer):
    from ipercore_tpu.models.mesh import part_face_mask

    theta = _theta(1)
    d = smpl_mod.get_details(composer.model, theta)
    info = fc.render_smpl_info(composer, d["verts"], d["cam"])
    mask = part_face_mask(composer.assets, ["upper"])
    info = fc.add_selected_f2pts(info, mask)
    sel = np.asarray(info["selected_f2pts"])
    not_upper = ~np.asarray(mask)
    assert (sel[0][not_upper] == fc.rz.FLOW_SENTINEL).all()

    uvs = jnp.asarray(np.random.RandomState(5).rand(2, S, S, 3), jnp.float32)
    vis = jnp.ones((2, S, S, 1), jnp.float32)
    merged = fc.merge_uv_img(uvs, vis)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(uvs).mean(0), atol=1e-5)
