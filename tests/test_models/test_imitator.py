import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.models import imitator as imit
from ipercore_tpu.models.mesh import load_assets, part_face_mask
from ipercore_tpu.models.networks import build_generator

S = 64
NS = 2

CFG = {
    "BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 1},
    "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
    "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
}


@pytest.fixture(scope="module")
def rig():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=11)
    gen = build_generator("AttLWB-SPADE", CFG)
    rng = np.random.RandomState(0)
    bg = jnp.zeros((1, 1, S, S, 4))
    src = jnp.zeros((1, NS, S, S, 6))
    tsf = jnp.zeros((1, 1, S, S, 6))
    Tst = jnp.zeros((1, 1, NS, S, S, 2))
    params = jax.jit(lambda r: gen.init(r, bg, src, tsf, Tst))(jax.random.PRNGKey(0))
    return comp, gen, params


def _theta(n, seed=0):
    rng = np.random.RandomState(seed)
    t = np.zeros((n, 85), np.float32)
    t[:, 0] = 1.2
    t[:, 3:75] = rng.randn(n, 72) * 0.05
    t[:, 75:] = rng.randn(n, 10) * 0.2
    return jnp.asarray(t)


def test_setup_source_and_synthesize(rig):
    comp, gen, params = rig
    rng = np.random.RandomState(1)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    src_smpl = _theta(NS).reshape(1, NS, 85)
    cache = jax.jit(lambda p, si, ss: imit.setup_source(comp, gen, p, si, ss))(params, src_img, src_smpl)
    assert cache.uv_img.shape == (1, S, S, 3)
    assert cache.bg_img.shape == (1, S, S, 3)
    assert cache.src_f2pts.shape == (NS, comp.model.faces.shape[0], 3, 2)

    tgt = _theta(3, seed=2)
    preds, masks = imit.synthesize_frames(comp, gen, params, cache, tgt)
    assert preds.shape == (3, S, S, 3)
    assert masks.shape == (3, S, S, 1)
    assert np.isfinite(np.asarray(preds)).all()


def test_synthesize_temporal(rig):
    comp, gen_plain, _ = rig
    gen = build_generator("AttLWB-SPADE", CFG, temporal=True)
    bg = jnp.zeros((1, 1, S, S, 4))
    src = jnp.zeros((1, NS, S, S, 6))
    tsf = jnp.zeros((1, 2, S, S, 6))
    Tst = jnp.zeros((1, 2, NS, S, S, 2))
    Ttt = jnp.zeros((1, 1, S, S, 2))
    params = jax.jit(lambda r: gen.init(r, bg, src, tsf, Tst, Ttt))(jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    src_smpl = _theta(NS).reshape(1, NS, 85)
    cache = jax.jit(lambda p, si, ss: imit.setup_source(comp, gen, p, si, ss))(params, src_img, src_smpl)
    tgt = _theta(3, seed=4)
    preds, masks = imit.synthesize_frames_temporal(comp, gen, params, cache, tgt)
    assert preds.shape == (3, S, S, 3)


def test_novel_view_ring():
    src = jnp.asarray(np.concatenate([[1.2, 0, 0], np.zeros(72), np.zeros(10)]).astype(np.float32))
    smpls = imit.make_novel_view_smpls(src, n_frames=8)
    assert smpls.shape == (8, 85)
    # frame 0 has the original orientation
    np.testing.assert_allclose(np.asarray(smpls[0, 3:6]), 0.0, atol=1e-5)
    # frame 4 is rotated ~180 deg about y
    a = np.asarray(smpls[4, 3:6])
    assert abs(np.linalg.norm(a) - np.pi) < 1e-3


def test_view_effect_rotates():
    smpls = jnp.zeros((2, 85))
    out = imit.add_view_effect(smpls, 90.0)
    a = np.asarray(out[:, 3:6])
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), np.pi / 2, atol=1e-4)


def test_bullet_time_splices():
    smpls = jnp.zeros((10, 85))
    out = imit.add_bullet_time_effect(smpls, [5], duration=12)
    assert out.shape == (22, 85)


def _fg_box(fim):
    """Foreground bbox (y0, y1, x0, x1) of a face-index map."""
    m = np.asarray(fim >= 0)
    ys, xs = np.where(m)
    return ys.min(), ys.max(), xs.min(), xs.max()


def test_prepare_targets_matches_source_framing(rig):
    """Source and reference cameras differ; after the cam swap the rendered
    target must frame the person like the SOURCE camera does — parity with
    `swap_params` (`imitator.py:248-258`) + `cam_swap` (`cam_pose_utils.py:17`)."""
    comp, gen, params = rig
    rng = np.random.RandomState(7)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S, S, 3)), jnp.float32)
    src_smpl = np.asarray(_theta(NS, seed=8)).copy()
    src_smpl[:, 0:3] = [1.4, 0.05, -0.05]  # big, centered-ish person
    cache = imit.setup_source(comp, gen, params, src_img, jnp.asarray(src_smpl)[None])

    tgt = np.asarray(_theta(5, seed=9)).copy()
    tgt[:, 0:3] = [0.5, -0.6, 0.45]  # small, far off-center reference camera
    tgt[:, 2] += np.arange(5) * 0.01

    out = imit.prepare_target_smpls(comp.model, cache, tgt, cam_strategy="smooth")
    assert out.shape == (5, 85)
    # shape is replaced by the source person's betas
    np.testing.assert_allclose(out[:, 75:], np.tile(src_smpl[0:1, 75:], (5, 1)), atol=1e-6)
    # smooth: stabilize resets the ref cam to (1, 0, ty), so the swapped scale
    # and tx equal the source camera's
    np.testing.assert_allclose(out[:, 0], src_smpl[0, 0], atol=1e-5)
    np.testing.assert_allclose(out[:, 1], src_smpl[0, 1], atol=1e-5)

    # pixel-level: rendered fg box of the prepared frame matches the source
    # render far better than the raw reference camera does
    def box_of(theta):
        d = smpl_mod.get_details(comp.model, jnp.asarray(theta[None]))
        info = fc.render_smpl_info(comp, d["verts"], d["cam"], use_morph=False,
                                   get_uv_info=False, need_vis=False)
        return _fg_box(info["fim"][0])

    src_box = np.asarray(box_of(src_smpl[0]), np.float32)
    swapped_box = np.asarray(box_of(out[0]), np.float32)
    raw_box = np.asarray(box_of(np.concatenate([tgt[0, 0:3], out[0, 3:]])), np.float32)
    assert np.abs(swapped_box - src_box).max() < np.abs(raw_box - src_box).max() / 2

    # "source" strategy pins the camera wholesale
    out_src = imit.prepare_target_smpls(comp.model, cache, tgt, cam_strategy="source")
    np.testing.assert_allclose(out_src[:, 0:3], np.tile(src_smpl[0:1, 0:3], (5, 1)), atol=1e-6)
    # "copy" keeps the reference camera
    out_copy = imit.prepare_target_smpls(comp.model, cache, tgt, cam_strategy="copy")
    np.testing.assert_allclose(out_copy[:, 0:3], tgt[:, 0:3], atol=1e-6)


def test_swapper_merge(rig):
    comp, gen, params = rig
    rng = np.random.RandomState(5)
    caches = []
    for i in range(2):
        src_img = jnp.asarray(rng.uniform(-1, 1, (1, 1, S, S, 3)), jnp.float32)
        src_smpl = _theta(1, seed=10 + i).reshape(1, 1, 85)
        caches.append(imit.setup_source(comp, gen, params, src_img, src_smpl))
    upper = part_face_mask(comp.assets, ["upper"])
    rest = ~upper
    merged = imit.merge_source_caches(comp, caches, [rest, upper])
    assert merged.src_f2pts.shape == (2, comp.model.faces.shape[0], 3, 2)
    assert merged.uv_img.shape == (1, S, S, 3)
    preds, _ = imit.synthesize_frames(comp, gen, params, merged, _theta(2, seed=6))
    assert preds.shape == (2, S, S, 3)


def test_temporal_fused_inputs_match_fallback():
    """The fused temporal geometry (per-frame aux set through ONE kernel
    pass, interpret mode) must agree with the render_smpl_info +
    cal_bc_transform fallback the scan otherwise uses."""
    from ipercore_tpu.ops import rasterizer as rz

    S128 = 128
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    comp = fc.make_composer(model, assets, image_size=S128, out_dilate_ks=11)
    gen = build_generator("AttLWB-SPADE", CFG)
    rng = np.random.RandomState(3)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, NS, S128, S128, 3)), jnp.float32)
    src_smpl = _theta(NS).reshape(1, NS, 85)
    params = jax.jit(lambda r: gen.init(
        r, jnp.zeros((1, 1, S128, S128, 4)), jnp.zeros((1, NS, S128, S128, 6)),
        jnp.zeros((1, 1, S128, S128, 6)), jnp.zeros((1, 1, NS, S128, S128, 2))))(
        jax.random.PRNGKey(0))
    cache = jax.jit(lambda p, si, ss: imit.setup_source(comp, gen, p, si, ss))(
        params, src_img, src_smpl)
    tgt = _theta(2, seed=5)

    tsf_f, Tst_f, Ttt_f = imit.make_temporal_inputs_fused(
        comp, cache, tgt, interpret=True)

    # fallback quantities
    tsf_r, Tst_r, ref_info = imit.make_frame_inputs(
        comp, cache, tgt, full_ref_info=True, tst_stride=1)
    f2pts_seq = ref_info["f2pts"]
    prev = jnp.concatenate([f2pts_seq[:1], f2pts_seq[:-1]], axis=0)
    Ttt_r = rz.cal_bc_transform(prev, ref_info["fim"], ref_info["wim"])

    # the kernels may break z-ties differently on sliver faces; compare on
    # the overwhelming majority of agreeing pixels
    for a, b, name, tol in ((tsf_f, tsf_r, "tsf_inputs", 2e-2),
                            (Tst_f, Tst_r, "Tst", 2e-2),
                            (Ttt_f, Ttt_r, "Ttt", 2e-2)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        close = np.isclose(a, b, atol=tol).mean()
        assert close > 0.99, (name, close)
