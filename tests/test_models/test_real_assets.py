"""Real-asset end-to-end checks: the REAL SMPL template (mapper_uv.txt,
6890 verts / 13776 faces / 7576 UV verts) + real part/front JSONs, exercised
through the UV-merge / flow pipeline — closing the round-1 gap where
everything was validated only on a synthetic sphere.

Skipped when the reference assets are absent (off-box)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.models.mesh import load_assets, find_asset

pytestmark = pytest.mark.skipif(
    find_asset("mapper_uv.txt") is None, reason="reference assets not present")

S = 64


@pytest.fixture(scope="module")
def real_rig():
    model = smpl_mod.template_model()
    assets = load_assets(model)
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=11)
    return model, assets, comp


def test_assets_are_real_not_synthetic(real_rig):
    model, assets, _ = real_rig
    # real cardinalities: 6890 verts, 13776 faces, 7576 UV verts (fan-
    # triangulated f v/vt lines of mapper_uv.txt)
    assert model.v_template.shape == (6890, 3)
    assert model.faces.shape == (13776, 3)
    assert assets.f2uvs.shape == (13776, 3, 2)
    assert int(assets.obj_faces.max()) == 7575  # indexes the 7576 UV verts
    # part labels come from smpl_part_info.json (facial overrides head faces)
    hist = np.bincount(np.asarray(assets.face_parts), minlength=11)
    assert hist[10] == 1324  # 10_facial_large faces
    assert hist[1] == 3414   # torso faces
    # front/facial masks match the JSON face lists exactly
    assert int(assets.front_face_mask.sum()) == 2783
    assert int(assets.facial_face_mask.sum()) == 1324
    # y-down screen convention: feet below head in rest pose
    v = np.asarray(model.v_template)
    head_y = v[np.asarray(model.j_regressor).argmax(axis=1)[15], 1]
    assert head_y < 0 < v[:, 1].max()


def test_template_kinematics_localized(real_rig):
    model, _, _ = real_rig
    theta = np.zeros((1, 85), np.float32)
    theta[:, 0] = 1.0
    rest = np.asarray(smpl_mod.get_details(model, jnp.asarray(theta))["verts"][0])
    bent = theta.copy()
    bent[0, 3 + 4 * 3] = 1.0  # left knee
    posed = np.asarray(smpl_mod.get_details(model, jnp.asarray(bent))["verts"][0])
    delta = np.linalg.norm(posed - rest, axis=1)
    import json

    pi = json.load(open(find_asset("smpl_part_info.json")))
    foot = np.asarray(pi["06_left_foot"]["vertex"])
    head = np.asarray(pi["00_head"]["vertex"])
    assert delta[foot].mean() > 0.1
    assert delta[head].mean() < 0.01


def test_uv_merge_and_flows_on_real_topology(real_rig):
    """Render the real mesh, merge two views into UV space, and warp back to a
    target pose — the `make_uv_img` -> `make_tsf_inputs` -> Tst chain on the
    real 7576-UV-vert topology (`flowcomposition.py:87-258,514`)."""
    model, assets, comp = real_rig
    from ipercore_tpu.ops import rasterizer as rz
    from ipercore_tpu.ops.sampling import grid_sample

    ns = 2
    theta = np.zeros((ns, 85), np.float32)
    theta[:, 0] = 0.9
    theta[1, 3 + 1] = np.pi  # second view: rotated 180 about y
    details = smpl_mod.get_details(model, jnp.asarray(theta))
    src_info = fc.render_smpl_info(
        comp, details["verts"], details["cam"], use_morph=True, get_uv_info=True)

    fim = np.asarray(src_info["fim"])
    assert fim.shape == (ns, S, S)
    cov = (fim >= 0).mean(axis=(1, 2))
    assert (cov > 0.05).all(), f"body coverage too small: {cov}"

    rng = np.random.RandomState(0)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, ns, S, S, 3)), jnp.float32)
    uv_img, input_G_bg, input_G_src = fc.process_source(comp, src_img, src_info)
    assert uv_img.shape == (1, S, S, 3)
    uv_cov = float((jnp.abs(uv_img).sum(-1) > 1e-6).mean())
    assert uv_cov > 0.15, f"UV atlas coverage {uv_cov}"  # both views contribute

    # warp UV image to a new target pose
    tgt = np.zeros((1, 85), np.float32)
    tgt[:, 0] = 0.9
    tgt[0, 3 + 50] = 0.3
    td = smpl_mod.get_details(model, jnp.asarray(tgt))
    ref_info = fc.render_smpl_info(
        comp, td["verts"], td["cam"], use_morph=False, get_uv_info=False, need_vis=False)
    tsf_inputs = fc.make_tsf_inputs(comp, uv_img, ref_info)
    syn = np.asarray(tsf_inputs[0, 0, ..., 0:3])
    tgt_fg = np.asarray(ref_info["fim"][0] >= 0)
    # the warped appearance must land on the target body silhouette
    assert (np.abs(syn[tgt_fg]).sum(-1) > 1e-6).mean() > 0.8
    assert np.isfinite(syn).all()

    # Tst flows: source f2pts gathered through target fim/wim
    src_f2pts = src_info["f2pts"]
    Tst = rz.cal_bc_transform(
        src_f2pts[0:1], ref_info["fim"], ref_info["wim"])
    assert Tst.shape == (1, S, S, 2)
    inside = np.asarray(jnp.abs(Tst))[0][tgt_fg]
    assert (inside <= 1.5).all()  # flow targets stay in/near NDC
